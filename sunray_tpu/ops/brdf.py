"""BRDF math: ONB, GGX terms, VNDF sampling, cosine hemisphere, light eval.

Formula-for-formula port of shaders/rt_utils.slang:150-263 (the algorithms
carry over; the execution model — batched arrays instead of per-thread
scalars — does not). All functions broadcast over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159  # the reference uses 3.14159 (not jnp.pi) throughout
PI_VNDF = 3.14159265  # sample_ggx_vndf uses the longer constant (rt_utils.slang:192)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def safe_sqrt(x, eps=1e-20):
    """sqrt with a finite gradient at 0 (grad of sqrt(max(x,0)) is inf at 0,
    which turns into NaN through masked `where` branches in reverse mode)."""
    return jnp.sqrt(jnp.maximum(x, eps))


def vec_norm(v, eps=1e-20):
    """Gradient-safe vector norm."""
    return safe_sqrt(jnp.sum(v * v, axis=-1), eps)


def normalize(v, eps=0.0):
    n = vec_norm(v)[..., None]
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def reflect(i, n):
    """GLSL reflect: i - 2*dot(n,i)*n."""
    return i - 2.0 * dot(n, i)[..., None] * n


def refract(i, n, eta):
    """GLSL refract. Returns zero vector on total internal reflection."""
    cosi = dot(n, i)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = k < 0.0
    r = eta[..., None] * i - (eta * cosi + safe_sqrt(k))[..., None] * n
    return jnp.where(tir[..., None], 0.0, r)


def build_onb(n):
    """Branchless ONB (rt_utils.slang:150-156, Duff et al.). -> (t, b)."""
    sign_n = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign_n + n[..., 2])
    bb = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [
            1.0 + sign_n * n[..., 0] * n[..., 0] * a,
            sign_n * bb,
            -sign_n * n[..., 0],
        ],
        axis=-1,
    )
    b = jnp.stack(
        [bb, sign_n + n[..., 1] * n[..., 1] * a, -n[..., 1]],
        axis=-1,
    )
    return t, b


def smith_v_ggx(NdotV, NdotL, alpha):
    """rt_utils.slang:158-163."""
    a2 = alpha * alpha
    ggx_v = NdotL * jnp.sqrt(NdotV * NdotV * (1.0 - a2) + a2)
    ggx_l = NdotV * jnp.sqrt(NdotL * NdotL * (1.0 - a2) + a2)
    return 0.5 / jnp.maximum(ggx_v + ggx_l, 1e-4)


def smith_g1_ggx(NdotX, alpha):
    """rt_utils.slang:165-169."""
    a2 = alpha * alpha
    denom = NdotX + jnp.sqrt(a2 + (1.0 - a2) * NdotX * NdotX)
    return 2.0 * NdotX / jnp.maximum(denom, 1e-4)


def cosine_hemisphere(normal, r1, r2):
    """get_random_bounce (rt_utils.slang:171-177)."""
    phi = 2.0 * PI * r1
    r = jnp.sqrt(r2)
    u, v = build_onb(normal)
    d = (
        u * (jnp.cos(phi) * r)[..., None]
        + v * (jnp.sin(phi) * r)[..., None]
        + normal * safe_sqrt(1.0 - r2)[..., None]
    )
    return normalize(d)


def sample_ggx_vndf(normal, v_world, roughness, r1, r2):
    """Heitz VNDF half-vector sampling (rt_utils.slang:179-201)."""
    t, b = build_onb(normal)
    vl = jnp.stack(
        [dot(v_world, t), dot(v_world, b), dot(v_world, normal)], axis=-1
    )
    a = jnp.maximum(roughness * roughness, 0.001)
    vh = normalize(
        jnp.stack([a * vl[..., 0], a * vl[..., 1], vl[..., 2]], axis=-1)
    )

    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = jnp.where(lensq > 0.0, 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-30)), 0.0)
    t1 = jnp.where(
        (lensq > 0.0)[..., None],
        jnp.stack([-vh[..., 1], vh[..., 0], jnp.zeros_like(lensq)], axis=-1)
        * inv_len[..., None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], vh.dtype), vh.shape),
    )
    t2 = jnp.cross(vh, t1)

    rr = jnp.sqrt(r1)
    phi = 2.0 * PI_VNDF * r2
    p1 = rr * jnp.cos(phi)
    p2 = rr * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2

    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))[..., None] * vh
    )
    hl = normalize(
        jnp.stack(
            [a * nh[..., 0], a * nh[..., 1], jnp.maximum(0.0, nh[..., 2])],
            axis=-1,
        )
    )
    return t * hl[..., 0:1] + b * hl[..., 1:2] + normal * hl[..., 2:3]


def eval_unshadowed_light(
    hit_pos, hit_normal, v_view, hit_albedo, roughness, metallic,
    light_emission, light_pos, light_normal,
):
    """Unshadowed direct-light contribution (rt_utils.slang:203-234).

    GGX D*V*F specular + Lambert diffuse, times NdotL * cos_light / dist^2.
    Returns (..., 3) RGB.
    """
    l = light_pos - hit_pos
    dist = jnp.maximum(vec_norm(l), 1e-4)
    l = l / dist[..., None]

    NdotL = jnp.maximum(dot(hit_normal, l), 0.0)
    cos_light = jnp.maximum(dot(light_normal, -l), 0.0)
    lit = (NdotL > 0.0) & (cos_light > 0.0)

    h = normalize(v_view + l, eps=1e-12)
    NdotH = jnp.maximum(dot(hit_normal, h), 0.0)
    VdotH = jnp.maximum(dot(v_view, h), 0.0)
    NdotV = jnp.maximum(dot(hit_normal, v_view), 0.001)

    a = roughness * roughness
    a2 = a * a
    denom = NdotH * NdotH * (a2 - 1.0) + 1.0
    d_term = a2 / (PI * denom * denom)

    f0 = jnp.asarray(0.04) * (1.0 - metallic[..., None]) + hit_albedo * metallic[..., None]
    f = f0 + (1.0 - f0) * ((1.0 - VdotH) ** 5)[..., None]

    v_term = smith_v_ggx(NdotV, NdotL, a)
    specular = (d_term * v_term)[..., None] * f
    diffuse = hit_albedo * (1.0 - metallic[..., None]) * (1.0 - f) / PI
    geometry = NdotL * cos_light / jnp.maximum(dist * dist, 1e-4)

    out = light_emission * (diffuse + specular) * geometry[..., None]
    return jnp.where(lit[..., None], out, 0.0)


def luminance_max(rgb):
    """p_hat = max channel (used as the ReSTIR target function)."""
    return jnp.max(rgb, axis=-1)


def gi_target_pdf(shade_pos, shade_normal, albedo, metallic, sample_pos, sample_radiance):
    """rt_utils.slang:255-263."""
    w = sample_pos - shade_pos
    d = jnp.maximum(vec_norm(w), 1e-4)
    w = w / d[..., None]
    NdotL = jnp.maximum(dot(shade_normal, w), 0.0)
    f_diffuse = albedo * (1.0 - metallic[..., None]) / PI
    contrib = sample_radiance * f_diffuse * NdotL[..., None]
    return jnp.max(contrib, axis=-1)


def eval_p_hat_planar(px, nx, vx, al, rough, metal, em, lpos, lnrm):
    """Planar (component-plane) form of eval_unshadowed_light -> p_hat.

    Surface attributes arrive as broadcastable planes (typically (P, 1)):
    px/nx/vx/al = 3-component lists, rough/metal single planes. Light
    sample fields are 3-component lists of (P, K) planes. Returns
    (p_hat (P, K), lit (P, K), f_channels [3 x (P, K)]).

    Bit-exact with eval_unshadowed_light followed by luminance_max on
    matching lanes (same op order per element; division — not
    reciprocal-multiply — everywhere the reference divides): the batched
    RIS audition and spatial reuse fold K candidate/tap evaluations into
    K-wide lanes so the surface attributes are read ONCE instead of per
    candidate (rt_utils.slang:203-234; restir.ris_audition).
    """
    l = [lpos[a] - px[a] for a in range(3)]
    dist = jnp.maximum(
        safe_sqrt(l[0] * l[0] + l[1] * l[1] + l[2] * l[2]), 1e-4
    )
    l = [l[a] / dist for a in range(3)]
    ndl = jnp.maximum(nx[0] * l[0] + nx[1] * l[1] + nx[2] * l[2], 0.0)
    cos_light = jnp.maximum(
        -(lnrm[0] * l[0] + lnrm[1] * l[1] + lnrm[2] * l[2]), 0.0
    )
    lit = (ndl > 0.0) & (cos_light > 0.0)
    h = [vx[a] + l[a] for a in range(3)]
    h_n = jnp.maximum(
        safe_sqrt(h[0] * h[0] + h[1] * h[1] + h[2] * h[2]), 1e-12
    )
    h = [h[a] / h_n for a in range(3)]
    ndh = jnp.maximum(nx[0] * h[0] + nx[1] * h[1] + nx[2] * h[2], 0.0)
    vdh = jnp.maximum(vx[0] * h[0] + vx[1] * h[1] + vx[2] * h[2], 0.0)
    ndv = jnp.maximum(
        nx[0] * vx[0] + nx[1] * vx[1] + nx[2] * vx[2], 0.001
    )
    a_r = rough * rough
    a2 = a_r * a_r
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    d_term = a2 / (PI * denom * denom)
    ggx_v = ndl * jnp.sqrt(ndv * ndv * (1.0 - a2) + a2)
    ggx_l = ndv * jnp.sqrt(ndl * ndl * (1.0 - a2) + a2)
    v_term = 0.5 / jnp.maximum(ggx_v + ggx_l, 1e-4)
    fres5 = (1.0 - vdh) ** 5
    geometry = ndl * cos_light / jnp.maximum(dist * dist, 1e-4)
    p_hat = None
    fc = []
    for c in range(3):
        f0 = 0.04 * (1.0 - metal) + al[c] * metal
        f = f0 + (1.0 - f0) * fres5
        specular = d_term * v_term * f
        diffuse = al[c] * (1.0 - metal) * (1.0 - f) / PI
        out_c = em[c] * (diffuse + specular) * geometry
        out_c = jnp.where(lit, out_c, 0.0)
        fc.append(out_c)
        p_hat = out_c if p_hat is None else jnp.maximum(p_hat, out_c)
    return p_hat, lit, fc


def gi_target_pdf_planar(px, nx, al, metal, spos, srad):
    """Planar (P, K) form of gi_target_pdf (rt_utils.slang:255-263):
    surface attrs as broadcastable planes (px/nx/al 3-lists, metal one
    plane), sample fields as 3-lists of (P, K) planes. Same op order as
    the (…, 3) form — see eval_p_hat_planar."""
    w = [spos[a] - px[a] for a in range(3)]
    d = jnp.maximum(safe_sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]),
                    1e-4)
    w = [w[a] / d for a in range(3)]
    ndl = jnp.maximum(nx[0] * w[0] + nx[1] * w[1] + nx[2] * w[2], 0.0)
    p_hat = None
    for c in range(3):
        f_diffuse = al[c] * (1.0 - metal) / PI
        contrib = srad[c] * f_diffuse * ndl
        p_hat = contrib if p_hat is None else jnp.maximum(p_hat, contrib)
    return p_hat
