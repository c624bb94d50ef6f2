"""SoA mesh/scene containers — the framework's data model.

Replaces the reference's `Object`/`World` object graph (/root/reference/src/
objects.rs:18-62) with flat structure-of-arrays pytrees: one global vertex
pool, one global triangle pool, a per-triangle object id indexing a material
table. This is the layout XLA/Pallas want (contiguous [T, 3] arrays, no
pointer chasing) and it makes the whole scene a differentiable pytree —
gradients w.r.t. `verts`, `normals`, `colors`, `materials` fall out of
jax.grad, which is the north-star capability the Rust reference lacks.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from raytracing_tpu.ops.intersect import TriangleSoA


class Mesh(NamedTuple):
    """All scene geometry, concatenated across objects.

    verts:     [V, 3] f32 vertex positions (object offsets pre-applied at
               load, as in `read_obj`, main.rs:53).
    tri_v:     [T, 3] i32 vertex indices into `verts` (the reference's
               indexed `Triangle{a,b,c}`, objects.rs:193-198).
    normals:   [T, 3] f32 per-face shading normals, precomputed at load
               (objects.rs:206-220) or overridden per object (the ground
               plane forces (0,1,0) on both tris, main.rs:432-441 — its
               second triangle's geometric normal would be -y).
    colors:    [T, 3] f32 per-triangle base color.
    obj_id:    [T]    i32 object index -> material row.
    materials: [O, 3] f32 (albedo/pi, reflectivity, roughness) — albedo is
               stored pre-divided by pi like `Material::new`
               (objects.rs:184-190).
    obj_bounds:[O, 2, 3] f32 object AABBs (min, max) — `Object::from`
               computes these at build (objects.rs:41-62).
    """

    verts: jnp.ndarray
    tri_v: jnp.ndarray
    normals: jnp.ndarray
    colors: jnp.ndarray
    obj_id: jnp.ndarray
    materials: jnp.ndarray
    obj_bounds: jnp.ndarray

    @property
    def num_triangles(self) -> int:
        return self.tri_v.shape[0]

    @property
    def num_objects(self) -> int:
        return self.materials.shape[0]


class SphereLight(NamedTuple):
    """Spherical area lights — the realized version of the reference's
    declared-but-always-empty `Light` struct (objects.rs:13-16,
    main.rs:462 `lights: Vec::new(), // TODO`). Differentiable pytree:
    gradients flow to center/radius/emission through the soft-shadow
    estimator (ops/sampling.sample_cone + models/whitted.area_light_term).

    center:   [L, 3] f32
    radius:   [L]    f32
    emission: [L, 3] f32 radiance of the emitting surface
    """

    center: jnp.ndarray
    radius: jnp.ndarray
    emission: jnp.ndarray


class Scene(NamedTuple):
    """Mesh + lighting state (the reference's `World`, objects.rs:18-22;
    its `lights` vec is declared but always empty — main.rs:462 — so the
    only reference light is the `sun` point position, animated per frame.
    `lights` adds the area lights the reference stubbed out)."""

    mesh: Mesh
    sun: jnp.ndarray  # [3] f32
    lights: Optional[SphereLight] = None


def triangle_soa(verts: jnp.ndarray, tri_v: jnp.ndarray) -> TriangleSoA:
    """Differentiable v0/e1/e2 gather — the reference precomputes these in
    `pack_triangles` (simd_accel.rs:59-63); here it's a pure function of the
    vertex pool so vertex gradients flow through the intersection math."""
    va = verts[tri_v[:, 0]]
    vb = verts[tri_v[:, 1]]
    vc = verts[tri_v[:, 2]]
    return TriangleSoA(v0=va, e1=vb - va, e2=vc - va)


def _object_from_host(
    verts: np.ndarray,
    tri_v: np.ndarray,
    normals: np.ndarray,
    colors: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Object AABB from its vertex pool (Object::from, objects.rs:41-62)."""
    return verts.min(axis=0), verts.max(axis=0)


def concat_objects(
    objects: Sequence[dict],
) -> Mesh:
    """Build a Mesh from per-object dicts with keys:
    verts [V,3], tri_v [T,3], colors [T,3] or [3], material (albedo,
    reflectivity, roughness) — raw albedo, divided by pi here — and
    optional normals [T,3] (computed geometrically when absent).
    Host-side (numpy); returns device-ready Mesh of jnp arrays.
    """
    all_v, all_t, all_n, all_c, all_o = [], [], [], [], []
    mats, bounds = [], []
    v_off = 0
    for oi, ob in enumerate(objects):
        verts = np.asarray(ob["verts"], dtype=np.float32)
        tri_v = np.asarray(ob["tri_v"], dtype=np.int32)
        colors = np.asarray(ob["colors"], dtype=np.float32)
        if colors.ndim == 1:
            colors = np.broadcast_to(colors, (tri_v.shape[0], 3)).copy()
        normals = ob.get("normals")
        if normals is None:
            va, vb, vc = (verts[tri_v[:, k]] for k in range(3))
            n = np.cross(vb - va, vc - va)
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
            normals = n.astype(np.float32)
        else:
            normals = np.asarray(normals, dtype=np.float32)
        albedo, refl, rough = ob["material"]
        mats.append((albedo / np.pi, refl, rough))
        bounds.append(_object_from_host(verts, tri_v, normals, colors))
        all_v.append(verts)
        all_t.append(tri_v + v_off)
        all_n.append(normals)
        all_c.append(colors)
        all_o.append(np.full(tri_v.shape[0], oi, dtype=np.int32))
        v_off += verts.shape[0]
    return Mesh(
        verts=jnp.asarray(np.concatenate(all_v)),
        tri_v=jnp.asarray(np.concatenate(all_t)),
        normals=jnp.asarray(np.concatenate(all_n)),
        colors=jnp.asarray(np.concatenate(all_c)),
        obj_id=jnp.asarray(np.concatenate(all_o)),
        materials=jnp.asarray(np.array(mats, dtype=np.float32)),
        obj_bounds=jnp.asarray(
            np.stack([np.stack(b) for b in bounds]).astype(np.float32)
        ),
    )
