from .msm_sharded import (  # noqa: F401
    AXIS,
    ShardedFixedBasePlan,
    default_mesh,
    msm_window_sums_sharded,
    sharded_stages,
    tree_add_points,
)
