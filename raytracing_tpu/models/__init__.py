from raytracing_tpu.models import camera, whitted  # noqa: F401
