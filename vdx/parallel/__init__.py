from vdx.parallel.mesh import (
    AXES,
    auto_mesh,
    make_mesh,
    param_sharding_rules,
    replicated,
    video_sharding,
)

__all__ = [
    "AXES",
    "auto_mesh",
    "make_mesh",
    "param_sharding_rules",
    "replicated",
    "video_sharding",
]
