"""Configuration system.

The reference has no config at all — compile-time consts (`main.rs:29-36`), a
hardcoded scene (`main.rs:406-448`) and a `// TODO: Use clap for CLI params`
(`main.rs:382`). Here every knob is an explicit, hashable dataclass so configs
can be passed as static arguments through `jax.jit`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


def _u8(r: int, g: int, b: int) -> Tuple[float, float, float]:
    return (r / 255.0, g / 255.0, b / 255.0)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render parameters.

    Defaults mirror the reference's compile-time constants
    (`/root/reference/src/main.rs:29-36`) and shading constants:
    800x800, SCALE=1, 4 stratified samples (2x2), REFLECT_DEPTH=4,
    DIFFUSE_DEPTH=2, DIFFUSE_SCATT=10, sky #87ceeb, gamma 2.2,
    normal offset 1e-5.
    """

    width: int = 800
    height: int = 800
    scale: float = 1.0
    # Stratified supersampling (`main.rs:321-365`). Any positive count:
    # sample s sits at a cell center of the gx x gy stratification grid
    # (ops/sampling.stratified_grid — 4 reproduces the reference's fixed
    # 2x2 pattern; non-square counts stratify on a rectangular grid).
    samples_per_pixel: int = 4
    reflect_depth: int = 4
    diffuse_depth: int = 2
    diffuse_scatter: int = 10
    sky_color: Tuple[float, float, float] = _u8(0x87, 0xCE, 0xEB)
    gamma: float = 2.2
    # Hit points are pushed off the surface along the face normal to avoid
    # self-intersection (`main.rs:121-124`).
    normal_offset: float = 1e-5
    # Möller–Trumbore epsilon for determinant / t acceptance.
    eps: float = 1e-8
    # Primary rays per wavefront chunk. Each chunk expands by a factor of
    # (1 + diffuse_scatter) at the secondary levels, so the live ray count is
    # chunk_size * 11 * levels; 64Ki keeps that well inside HBM while
    # cutting the frame's dispatch count 4x — per-chunk dispatch overhead
    # on the tunneled runtime (~2-3 ms/chunk, see models/whitted.
    # CHUNK_BURST) was most of the default-config frame floor at 16Ki
    # (157 chunks for the reference 800x800x4spp frame vs 40).
    chunk_size: int = 65536
    # Intersection backend: "bruteforce" (oracle), "cluster" (two-level
    # packet hierarchy, pure XLA), "pallas" (Pallas TPU megakernel).
    backend: str = "cluster"
    # Whether shading normals are the precomputed face normals carried on the
    # mesh (reference behaviour, `objects.rs:206-220`) or recomputed
    # differentiably from vertices ("geometric") so gradients flow to verts.
    normals: str = "stored"
    # Re-sort secondary (bounce) rays by (origin cell, direction cone)
    # before tracing so culling tiles stay coherent (pallas backend
    # only). Order-invisible semantically; a pure performance knob.
    bin_secondary: bool = True
    # Also re-bin PURE-REFLECT levels (depth > diffuse_depth, where no
    # diffuse fan is spawned). Tempting to skip — their wavefronts are
    # mostly dead and the re-bin pays 2 payload sorts of ~720k x 8
    # columns per level — but MEASURED a 1.9x frame LOSS when skipped
    # (1.88 -> 3.37 s, exp/NOTES_r5_wq.md): a mirror bounce of the
    # hemispherical GI fan scatters directions across the sphere, so
    # unbinned reflect tiles mix cones and their frustums balloon to
    # full-scene scans — the walks cost far more than the sorts saved.
    # Bit-exact either way (the permutation is undone before radiance
    # accumulation; no RNG is drawn at pure-reflect levels). Default ON.
    bin_reflect_levels: bool = True
    # Additionally re-sort each level's SHADOW rays by hit position: GI
    # hit points scatter across the scene, so the level's bounce-sorted
    # order leaves shadow tiles with ballooned frustums. Pays one extra
    # payload sort + unsort per level (pallas backend only). "auto" =
    # re-bin only when the frame has NO coarse gi_accel: with one, shadow
    # tiles visit most of its short cluster list sorted or not, so the
    # re-bin's two payload sorts are pure cost (measured 2.31 -> 2.23 s
    # on the reference frame, v5e). True/False force it either way.
    bin_shadow: object = "auto"
    # Cluster size of the AUTO-BUILT coarse second accel for the
    # incoherent bounce (depth>1) levels — see whitted.render. Bounce
    # tiles walk most of the scene's visit list, so per-visit fixed cost
    # dominates and bigger clusters amortize it (frame 2.62 -> 2.27 s
    # measured, v5e). Results are exact either way (same triangles; only
    # the walk partition changes). 0 disables the auto build; it is also
    # skipped when the primary accel is already at least this coarse, or
    # when an explicit gi_accel is passed. Pallas backend only.
    # 128 (not the round-4 64): the lane-aligned size the gi_wq DMA
    # fetch requires, and measured equal-or-better since the per-visit
    # fixed cost fell (exp/NOTES_r5_wq.md).
    gi_cluster_size: int = 128
    # Culling-tile size (rays per tile) for the incoherent bounce
    # (depth>1) levels' nearest + shadow queries, pallas backend only.
    # Bounce rays diverge, so a 1024-ray tile's frustum balloons; smaller
    # tiles tighten frustums (fewer clusters per visit list) at the price
    # of phase-1 rows and per-visit lane amortization. 0 = the kernel
    # default (kernels/traverse.RAY_TILE). Exact either way.
    gi_ray_tile: int = 0
    # Per-visit lane-slab pre-test for bounce (depth>1) queries (pallas
    # backend only): a GI tile's frustum-hull visit list overcounts the
    # clusters its ACTUAL rays enter ~2.6x (measured: 90 listed vs 34
    # entered per 1024-ray teapot GI tile), so the walk skips visits no
    # lane enters (kernels/traverse lane_cull — bit-exact; measured 99 ->
    # 78 ms on the busy chunk's GI trace).
    gi_lane_cull: bool = True
    # Work-queue traversal for bounce (depth>1) nearest + shadow queries
    # (pallas backend only): the visit loop becomes a Pallas GRID axis
    # with each visit's kernel block streamed by an index-map-driven DMA
    # (kernels/traverse._wq_kernel), deleting the dynamic walk loop's
    # ~0.9 us/visit fixed cost that round 4 isolated by elimination
    # (exp/NOTES_r4_gi.md); visit lists are per-ray refined first
    # (_lane_refine_lists) so the queue holds only ENTERED clusters.
    # Exact either way (bit-identical to the dynamic kernel, including
    # the overflow residual). Default ON: measured 1.641 -> 1.512 s on
    # the reference frame with the 128-cluster gi accel
    # (exp/NOTES_r5_wq.md); silently falls back to the dynamic kernels
    # when the bounce accel's cluster size is not a multiple of 128.
    gi_wq: bool = True
    # Visibility samples per spherical area light per shading point (only
    # used when the scene carries lights; see models/whitted.
    # area_light_term). More samples -> smoother penumbras.
    light_samples: int = 4
    # Two-phase cap for incoherent (bounce-level) nearest queries as a
    # fraction of the clustered-scene diagonal: phase 1 traces with tile
    # frustums truncated at cap, phase 2 retraces only the escaping
    # survivors. Exact either way; a pure performance knob (pallas
    # backend only). Default OFF: on the teapot frame the survivors don't
    # compact into free tiles and the second pass costs more than the
    # first saves — the coarse-cell/fine-cone bounce binning
    # (binning.bounce_bin_key) is what actually tames GI tiles there.
    gi_cap_frac: float = 0.0
    # Force the walk kernel's batched front-to-back early exit for bounce
    # (depth>1) nearest queries (pallas backend only). GI tiles walk
    # 350-640 of ~790 teapot clusters, so skipping the tail after the
    # first hit batch can pay even on scenes below the kernel's automatic
    # large-scene threshold. Exact either way (entry-t lower bounds).
    gi_early_exit: bool = True
    # Use the origin-folded "pmto" intersector for the PRIMARY level
    # (pallas backend): primaries of a pinhole camera share one origin, so
    # the Baldwin-Weber origin terms fold into per-triangle scalars (~25%
    # fewer VPU ops per test, kernels/traverse._pmt_o_tile). One of the
    # two knobs that break the cross-backend bit-identity contract (see
    # README "Bit-identity policy"): association differs, so acceptance-
    # boundary lanes may flip within one f32 rounding — default OFF.
    # Measured within noise on the reference frame (the primary level is
    # ~4 ms of a ~2 s frame), so the default favors the contract.
    primary_shared_origin: bool = False

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    @property
    def spp_grid(self):
        """Stratification grid (gx, gy), gx * gy == samples_per_pixel —
        any positive spp is valid (rectangular grid for non-squares)."""
        from raytracing_tpu.ops.sampling import stratified_grid

        return stratified_grid(self.samples_per_pixel)


# Reference scene materials (`main.rs:426-447`): Material::new(albedo,
# reflectivity, roughness); albedo is stored pre-divided by pi
# (`objects.rs:184-190`) — we keep the same convention in Mesh.materials.
TEAPOT1_MATERIAL = (1.0, 0.9, 0.1)
TEAPOT2_MATERIAL = (1.0, 0.025, 0.975)
GROUND_MATERIAL = (1.0, 0.0, 1.0)

TEAPOT1_COLOR = _u8(0x50, 0xC8, 0x78)
TEAPOT2_COLOR = _u8(0xFF, 0x00, 0x00)
GROUND_COLOR = _u8(128, 128, 128)
