from raytracing_tpu.geometry.mesh import Mesh, Scene, triangle_soa  # noqa: F401
from raytracing_tpu.geometry.obj import read_obj  # noqa: F401
from raytracing_tpu.geometry.scene import build_default_scene, sun_position  # noqa: F401
