from raytracing_tpu.accel.packets import (  # noqa: F401
    ClusterAccel,
    build_cluster_accel,
    packed_triangles,
    nearest_hit_cluster,
    any_hit_cluster,
)
