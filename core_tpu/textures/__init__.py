from core_tpu.textures.base import (  # noqa: F401
    TexType, TextureDef, TextureSet, build_texture_set, eval_texture,
)
