from raytracing_tpu.ops import color, intersect, linalg, sampling  # noqa: F401
