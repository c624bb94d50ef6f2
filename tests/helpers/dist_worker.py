"""Worker for the 2-process distributed smoke test: renders a small frame
over the global (2 processes x 4 virtual CPU devices) mesh and writes its
host-local shards. Usage: dist_worker.py <process_id> <port> <out_dir>"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from raytracing_tpu.parallel.distributed import (  # noqa: E402
    initialize,
    render_distributed,
    save_local_shards,
)


def main():
    pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    assert initialize(f"localhost:{port}", 2, pid)
    assert len(jax.devices()) == 8, len(jax.devices())

    from raytracing_tpu.accel.packets import build_cluster_accel
    from raytracing_tpu.config import RenderConfig
    from raytracing_tpu.geometry.scene import build_default_scene

    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=1,
                      backend="cluster", diffuse_scatter=2)
    rgb = render_distributed(scene, cfg, accel=accel)
    files = save_local_shards(rgb, out_dir)
    print(f"WROTE {len(files)}", flush=True)


if __name__ == "__main__":
    main()
