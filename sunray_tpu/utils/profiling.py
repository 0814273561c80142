"""Observability: per-stage timing, HLO dumps, device profiler traces.

The TPU analogs of the reference's tracing/observability surface
(SURVEY.md section 5.1/5.5):

  - per-pass debug-utils labels (graph.rs:1062-1118) -> named jax.profiler
    TraceAnnotations inside the frame (already implicit in op names) +
    stage_timings() wall-clock breakdown;
  - SUNRAY_GRAPH_DUMP_DIR graph dumps (graph_debug.rs) -> dump_hlo():
    the frame program's optimized HLO text + a pass/resource summary;
  - Nsight/Aftermath captures -> jax.profiler.trace() xplane traces
    viewable in TensorBoard/xprof.

Env flag: SUNRAY_TPU_DUMP_DIR (the SUNRAY_GRAPH_DUMP_DIR analog) — when
set, Renderer dumps the compiled frame HLO there on first compile.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

DUMP_DIR_ENV = "SUNRAY_TPU_DUMP_DIR"


def dump_hlo(fn, args, path: str, name: str = "frame") -> str:
    """Save lowered + compiled HLO for fn(*args) under path. Returns the
    compiled-text file path."""
    os.makedirs(path, exist_ok=True)
    lowered = jax.jit(fn).lower(*args)
    with open(os.path.join(path, f"{name}_lowered.txt"), "w") as f:
        f.write(lowered.as_text())
    compiled = lowered.compile()
    out = os.path.join(path, f"{name}_compiled.txt")
    with open(out, "w") as f:
        f.write(compiled.as_text() or "")
    with open(os.path.join(path, f"{name}_memory.txt"), "w") as f:
        try:
            mem = compiled.memory_analysis()
            f.write(str(mem))
        except Exception as e:  # pragma: no cover - backend-dependent
            f.write(f"memory analysis unavailable: {e}")
    return out


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (TensorBoard/xprof-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, top: int = 25, steady_frac: float = 0.5):
    """Parse the newest *.trace.json.gz under a device_trace() log dir into
    a per-op cost table (the manual workflow from docs/PERFORMANCE.md's
    "device profiler" loop, as a utility).

    Groups TensorCore complete-events by op name, keeping only the steady
    tail of the trace (`steady_frac` of wall time — skips compile/warmup
    events at the front). Returns a list of
    {"name", "total_ms", "count", "pct"} sorted by total time desc;
    prints the top `top` rows.
    """
    import glob
    import gzip
    import json

    paths = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # Device lanes: processes whose name mentions TPU/TensorCore; fall back
    # to every complete event if the metadata is absent.
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and any(k in e.get("args", {}).get("name", "")
                for k in ("TPU", "Tensor", "/device:"))
    }
    xs = [
        e for e in events
        if e.get("ph") == "X" and e.get("dur")
        and (not device_pids or e.get("pid") in device_pids)
    ]
    if not xs:
        raise ValueError("trace has no complete events on device lanes")
    t0 = min(e["ts"] for e in xs)
    t1 = max(e["ts"] + e["dur"] for e in xs)
    cut = t1 - (t1 - t0) * steady_frac
    agg: dict = {}
    for e in xs:
        if e["ts"] < cut:
            continue
        name = e["name"]
        # Runtime/host envelope events (CPU thunk executor, python frames,
        # trace bookkeeping) aren't device ops — skip so per-op tables and
        # the per-file attribution don't double-count the frame.
        if "::" in name or name.startswith("$"):
            continue
        # Whole-program envelope events (e.g. "jit__lambda(169...)" on TPU
        # lanes) span every op of the frame — counting them doubles the
        # table and drowns per-op attribution.
        if name.startswith("jit") and "(" in name:
            continue
        if name.startswith("end: "):  # DMA-completion markers
            name = name[5:]
        tot, cnt = agg.get(name, (0.0, 0))
        agg[name] = (tot + e["dur"], cnt + 1)
    total = sum(t for t, _ in agg.values())
    rows = [
        {"name": n, "total_ms": t / 1e3, "count": c,
         "pct": 100.0 * t / total}
        for n, (t, c) in agg.items()
    ]
    rows.sort(key=lambda r: -r["total_ms"])
    for r in rows[:top]:
        print(f"{r['total_ms']:9.2f} ms {r['pct']:5.1f}% x{r['count']:<5d} "
              f"{r['name'][:110]}")
    return rows


def hlo_source_map(hlo_text: str) -> dict:
    """Parse optimized-HLO text into {instruction_name: source_file}.

    Compiled HLO instructions carry `metadata={op_name=... source_file=...
    source_line=N}`; the device trace's complete-event names are the HLO
    instruction names, so this map joins profiler rows back to repo files
    (the docs/PERFORMANCE.md round-3 per-file budget workflow, made
    repeatable). Fusions attribute to their representative op's source —
    imperfect but stable round over round.
    """
    import re

    out = {}
    pat = re.compile(
        r"%?([\w\-.]+)\s*=.*?source_file=\"([^\"]+)\"")
    # Newer XLA emits stack_frame_id instead of inline source_file; the
    # op_name path still carries the render_frame stage named_scopes
    # (pipeline.py: ris_pass/final_pass/taa/denoise/postprocess), so fall
    # back to mapping each instruction to its stage scope.
    pat_op = re.compile(r"%?([\w\-.]+)\s*=.*?op_name=\"([^\"]+)\"")
    stage_pat = re.compile(
        r"\b(ris_pass|final_pass|taa|denoise|postprocess)\b")
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if m:
            out[m.group(1)] = m.group(2)
            continue
        m = pat_op.search(line)
        if m:
            s = stage_pat.search(m.group(2))
            out[m.group(1)] = f"stage:{s.group(1)}" if s else "<no-stage>"
    return out


def attribute_rows(rows, srcmap: dict, repo_root: str = "/root/repo"):
    """Aggregate summarize_trace() rows by source file via hlo_source_map.
    Returns [{"file", "total_ms", "pct"}] sorted desc; prints the table."""
    agg: dict = {}
    total = sum(r["total_ms"] for r in rows) or 1.0
    for r in rows:
        src = srcmap.get(r["name"])
        if src is None:
            # Trace names sometimes carry a suffix/prefix the HLO lacks;
            # retry with the trailing ".N" stripped.
            base = r["name"].rsplit(".", 1)[0]
            cands = [v for k, v in srcmap.items()
                     if k == base or k.startswith(r["name"])]
            src = cands[0] if cands else "<unmapped>"
        if src.startswith(repo_root):
            src = src[len(repo_root) + 1:]
        agg[src] = agg.get(src, 0.0) + r["total_ms"]
    out = [{"file": f, "total_ms": t, "pct": 100.0 * t / total}
           for f, t in agg.items()]
    out.sort(key=lambda r: -r["total_ms"])
    for r in out:
        print(f"{r['total_ms']:9.2f} ms {r['pct']:5.1f}%  {r['file']}")
    return out


def stage_timings(scene, cfg, state, mats, accel=None, repeats: int = 3):
    """Wall-clock per-stage breakdown of one frame, by running incremental
    prefixes of the pipeline (XLA fuses aggressively, so 'time inside one
    jitted program per pass' is not observable; prefix deltas are the
    honest proxy). Returns {stage: seconds}."""
    import jax.numpy as jnp

    from sunray_tpu.render import restir
    from sunray_tpu.render.gbuffer import ris_pass
    from sunray_tpu.render.pathtrace import final_pass
    from sunray_tpu.render.postprocess import (
        atrous_denoise,
        temporal_accumulate,
        tonemap,
    )
    from sunray_tpu.render.trace import make_tracer

    w, h = cfg.width, cfg.height

    def upto_ris(state):
        tracer = make_tracer(scene, cfg, accel)
        lights = restir.Lights(scene) if scene.num_lights > 0 else None
        return ris_pass(
            scene, cfg, tracer, lights, mats, state.prev_view_proj,
            state.res_di, state.res_gi, state.frame_count,
        )[:3]

    def upto_final(state):
        tracer = make_tracer(scene, cfg, accel)
        lights = restir.Lights(scene) if scene.num_lights > 0 else None
        gbuf, r_di, r_gi, _, _ = ris_pass(
            scene, cfg, tracer, lights, mats, state.prev_view_proj,
            state.res_di, state.res_gi, state.frame_count,
        )
        raw, _ = final_pass(
            scene, cfg, tracer, lights, mats, gbuf, r_di, r_gi,
            state.frame_count,
        )
        return raw

    def upto_post(state):
        tracer = make_tracer(scene, cfg, accel)
        lights = restir.Lights(scene) if scene.num_lights > 0 else None
        gbuf, r_di, r_gi, _, _ = ris_pass(
            scene, cfg, tracer, lights, mats, state.prev_view_proj,
            state.res_di, state.res_gi, state.frame_count,
        )
        raw, _ = final_pass(
            scene, cfg, tracer, lights, mats, gbuf, r_di, r_gi,
            state.frame_count,
        )
        raw_img = raw.reshape(h, w, 3)
        accum = temporal_accumulate(
            raw_img, gbuf.motion.reshape(h, w, 2), state.accum,
            state.frame_count, cfg.accumulation_factor,
        )
        den = atrous_denoise(
            accum, gbuf.depth.reshape(h, w), gbuf.normal.reshape(h, w, 3),
            gbuf.roughness.reshape(h, w), gbuf.diffuse.reshape(h, w, 3),
            cfg.denoise_passes,
        )
        return tonemap(den, cfg.exposure, cfg.tonemap, cfg.gamma)

    def timed(fn):
        jfn = jax.jit(fn)
        out = jfn(state)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(repeats):
            out = jfn(state)
        jax.block_until_ready(out)
        return (time.time() - t0) / repeats

    t_ris = timed(upto_ris)
    t_final = timed(upto_final)
    t_post = timed(upto_post)
    return {
        "ris_pass": t_ris,
        "final_pass": max(t_final - t_ris, 0.0),
        "post_pipeline": max(t_post - t_final, 0.0),
        "frame_total": t_post,
    }
