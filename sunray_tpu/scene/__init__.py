from sunray_tpu.scene.types import (
    MaterialTable,
    SceneBuffers,
    TextureAtlas,
    ALPHA_OPAQUE,
    ALPHA_MASK,
    ALPHA_BLEND,
    NULL_TEXTURE,
)
from sunray_tpu.scene.procedural import (
    cornell_box,
    cornell_box_many_lights,
    reflection_room,
)

__all__ = [
    "MaterialTable",
    "SceneBuffers",
    "TextureAtlas",
    "cornell_box",
    "cornell_box_many_lights",
    "reflection_room",
    "ALPHA_OPAQUE",
    "ALPHA_MASK",
    "ALPHA_BLEND",
    "NULL_TEXTURE",
]
