"""TPU-native mesh rasterizer: edge-function tests as MXU matmuls.

Replaces the reference's external CUDA rasterizer (neural_renderer,
reference: AvatarGen/AppearanceGen/models/utils.py:108-125,
AvatarGen/ShapeGen/render.py:32-57, AvatarAnimate/models/render.py:10-39)
with a fully jittable design built around one observation: a triangle
rasterizer is three edge-function evaluations plus a depth interpolation per
(pixel, face) pair, and each of those is *linear in the pixel coordinates* —
so the whole visibility problem becomes

    [P, 3] pixel matrix  @  [3, 4F] per-face coefficients  ->  [P, 4F]

which is exactly the systolic-array (MXU) shape TPUs are built for. Faces are
processed in chunks under a ``lax.scan`` carrying a running (nearest inverse
depth, face id) z-buffer, so peak memory is P x CHUNK instead of P x F.

Two front ends share this core:
  * :func:`render_mesh` — hard z-buffer rasterization + smooth shading, used
    for the detached GT template renders in train_clip (main.py:360) and the
    108-view NeuS-init renderer (ShapeGen/render.py:32-57);
  * :func:`soft_render_mesh` — SoftRas-style differentiable silhouette/color
    aggregation (sigmoid edge distances, depth-softmax blending) for the
    pose optimizers that backprop through rendering
    (AvatarAnimate/models/pose_generation.py:120-127).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class Projected(NamedTuple):
    sx: jnp.ndarray  # (V,) screen x (pixels)
    sy: jnp.ndarray  # (V,) screen y (pixels)
    inv_z: jnp.ndarray  # (V,) 1 / depth (depth = distance along -z, > 0 in front)
    in_front: jnp.ndarray  # (V,) bool


def project_vertices(
    vertices: jnp.ndarray,  # (V, 3) world
    pose: jnp.ndarray,  # (4, 4) camera-to-world
    H: int,
    W: int,
    focal: float,
) -> Projected:
    """World -> pixel projection with the same pinhole model as the ray
    generator (cameras.pixel_grid_rays), so rasterized GT images and NeuS
    renders line up pixel-for-pixel."""
    R = pose[:3, :3]
    t = pose[:3, 3]
    # HIGHEST precision: on TPU a default-precision (V,3)x(3,3) matmul runs
    # through bf16 passes and puts ~0.1-1 px of error on every screen
    # coordinate — at soft-raster sigma 0.5 that flips boundary sigmoids and
    # was measured perturbing downstream soft gradients by >100x vs CPU
    # (docs/PROFILE.md round 5). K=3, so full f32 is free.
    v_cam = jax.lax.dot_general(
        vertices - t, R, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # R^T (v - t)
    depth = -v_cam[:, 2]
    in_front = depth > 1e-6
    safe_depth = jnp.where(in_front, depth, 1.0)
    inv_z = jnp.where(in_front, 1.0 / safe_depth, 0.0)
    sx = W * 0.5 + focal * v_cam[:, 0] * inv_z
    sy = H * 0.5 - focal * v_cam[:, 1] * inv_z
    return Projected(sx, sy, inv_z, in_front)


def _face_coefficients(proj: Projected, faces: jnp.ndarray):
    """Per-face linear coefficients for the scan core.

    For face (a, b, c) with screen points A, B, C, the edge function
    E_bc(P) = (C-B) x (P-B) is linear in P = (px, py, 1). Stacking the three
    edge functions and the screen-linear 1/z interpolant gives a (3, F, 4)
    coefficient tensor; pixels @ coefficients evaluates all of them at once.

    Returns (coef (F, 3, 4), valid (F,), edge_inv_len (F, 3)).
    """
    A = jnp.stack([proj.sx[faces[:, 0]], proj.sy[faces[:, 0]]], -1)
    B = jnp.stack([proj.sx[faces[:, 1]], proj.sy[faces[:, 1]]], -1)
    C = jnp.stack([proj.sx[faces[:, 2]], proj.sy[faces[:, 2]]], -1)

    def edge(P0, P1):
        # e(P) = (P1x-P0x)(Py-P0y) - (P1y-P0y)(Px-P0x), as [cx, cy, c1]
        dx = P1[:, 0] - P0[:, 0]
        dy = P1[:, 1] - P0[:, 1]
        return jnp.stack([-dy, dx, dy * P0[:, 0] - dx * P0[:, 1]], -1), jnp.stack(
            [dx, dy], -1
        )

    e_bc, d_bc = edge(B, C)  # weight of vertex a
    e_ca, d_ca = edge(C, A)  # weight of vertex b
    e_ab, d_ab = edge(A, B)  # weight of vertex c

    # signed area * 2 = e_ab evaluated at C
    area2 = e_ab[:, 0] * C[:, 0] + e_ab[:, 1] * C[:, 1] + e_ab[:, 2]
    orient = jnp.sign(area2)
    orient = jnp.where(orient == 0, 1.0, orient)
    # Degenerate-face gate in PIXEL units (was 1e-12, which admitted
    # edge-on slivers down to |area2| ~ 5e-5 px^2 whose inv_area ~ 2e4
    # scales coef entries to ~1e5-1e7: their half-plane test then loses
    # boundedness to fp noise and the "triangle" rasterizes as a screen-
    # crossing line. Found on the round-5 chain: the 108-view t-pose
    # renders (arms edge-on in many azimuths) carried view-inconsistent
    # white spikes that capped the NeuS pretrain at IoU 0.57. A face
    # below 1e-3 px^2 is invisible to pixel-center sampling, so the gate
    # costs nothing visible.
    _MIN_AREA2 = 1e-3
    inv_area = orient / jnp.maximum(jnp.abs(area2), _MIN_AREA2)

    # orient edges so inside => all >= 0, and normalize to barycentric coords
    bary_a = e_bc * inv_area[:, None]
    bary_b = e_ca * inv_area[:, None]
    bary_c = e_ab * inv_area[:, None]

    # screen-linear inverse depth: 1/z(P) = sum_i bary_i(P) / z_i
    iz = (
        bary_a * proj.inv_z[faces[:, 0], None]
        + bary_b * proj.inv_z[faces[:, 1], None]
        + bary_c * proj.inv_z[faces[:, 2], None]
    )

    coef = jnp.stack([bary_a, bary_b, bary_c, iz], axis=-1)  # (F, 3, 4)

    valid = (
        proj.in_front[faces[:, 0]]
        & proj.in_front[faces[:, 1]]
        & proj.in_front[faces[:, 2]]
        & (jnp.abs(area2) > _MIN_AREA2)
    )

    def safe_len(d):
        # sqrt with an eps inside: zero-length edges of degenerate (padding)
        # faces would otherwise produce NaN gradients through norm at 0
        return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)

    edge_len = jnp.stack([safe_len(d_bc), safe_len(d_ca), safe_len(d_ab)], axis=-1)
    edge_inv_len = jnp.abs(area2)[:, None] / jnp.maximum(edge_len, 1e-12)
    return coef, valid, edge_inv_len


def _pixel_matrix(H: int, W: int) -> jnp.ndarray:
    py, px = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    # integer pixel coordinates, matching the ray generator's pixel lattice
    # (cameras.pixel_grid_rays uses linspace(0, W-1)); raster pixel (px, py)
    # therefore samples exactly the ray at (px, py)
    return jnp.stack(
        [px.reshape(-1), py.reshape(-1), jnp.ones(H * W)], axis=-1
    )  # (P, 3)


# A/B toggle (scripts/perf_experiments.py exp_glue): when True, the tiled
# z-buffer kernel carries the winner's barycentrics + exact inverse depth
# out of the kernel (ops/raster_zbuffer._select_update carry refs), removing
# the (P, 3, 4) coef gather + einsum recompute of _winner_outputs from the
# step. Trace-time constant: toggling it only affects NEWLY traced steps.
_CARRY_BARY = False

# A/B toggle (scripts/perf_experiments.py exp_glue): when True, untextured
# render_mesh calls additionally carry the winner's INTERPOLATED NORMAL out
# of the z-buffer kernel as three extra linear channels (the smooth normal
# is linear in the pixel: n(p, f) = pix @ (coef[f,:,:3] @ face_normals[f])),
# so the post-raster shading needs NO per-pixel gathers at all — the
# (P, 3, 3) face-normal gather + einsum become elementwise math on carried
# values. Implies the bary/iz carry. Trace-time constant.
_CARRY_SHADE = False


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "chunk", "use_kernel", "carry_bary", "interpret"),
)
def rasterize(
    proj_sx, proj_sy, proj_inv_z, proj_front,
    faces: jnp.ndarray,  # (F, 3) padded to multiple of chunk
    valid_faces: jnp.ndarray,  # (F,) bool (padding entries False)
    H: int,
    W: int,
    chunk: int = 2048,
    use_kernel: bool | None = None,
    carry_bary: bool | None = None,
    interpret: bool = False,
):
    """Hard z-buffer pass. Returns (face_id (P,) int32 [-1 = background],
    bary (P, 3), inv_z (P,)).

    On TPU the winner selection runs through the fused Pallas z-buffer
    kernel (ops/raster_zbuffer.py) — the (P, F) edge/depth tile never leaves
    VMEM and the winner is ordered by exact f32 inverse depth; elsewhere
    (CPU tests, interpret) the chunked-scan XLA path below is used, whose
    bf16 tile storage + packed-key quantization can differ on near-tied
    faces. Barycentrics/depth of the winner are recomputed exactly either
    way.
    """
    proj = Projected(proj_sx, proj_sy, proj_inv_z, proj_front)
    coef, cvalid, _ = _face_coefficients(proj, faces)
    valid = valid_faces & cvalid
    F = faces.shape[0]
    n_chunks = F // chunk

    pix = _pixel_matrix(H, W)  # (P, 3)
    P = pix.shape[0]

    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if carry_bary is None:
        carry_bary = _CARRY_BARY
    if use_kernel:
        from ..ops import raster_zbuffer

        # tiled kernel: same winners, empty (tile, face-block) pairs skipped
        if carry_bary:
            best_face, kbary, kiz = raster_zbuffer.zbuffer_select_tiled(
                coef, valid, proj.sx[faces], proj.sy[faces], H, W,
                carry_bary=True, interpret=interpret,
            )
            hit = best_face >= 0
            bary = jnp.clip(kbary, 0.0, 1.0)
            bary = bary / jnp.maximum(bary.sum(-1, keepdims=True), 1e-12)
            return best_face, bary, jnp.where(hit, kiz, 0.0)
        best_face = raster_zbuffer.zbuffer_select_tiled(
            coef, valid, proj.sx[faces], proj.sy[faces], H, W,
            interpret=interpret,
        )
        return _winner_outputs(pix, coef, best_face)

    coef_chunks = coef.reshape(n_chunks, chunk, 3, 4)
    valid_chunks = valid.reshape(n_chunks, chunk)

    # The (P, chunk, 4) edge/depth intermediate is the rasterizer's bandwidth
    # bill (GBs per scan step in f32), so it is STORED in bf16 while the
    # matmul computes from f32 operands: bf16 shares f32's exponent range, so
    # the near-zero values that decide inside/outside keep their sign
    # precisely. The chunk winner is selected by packing (quantized
    # inv-depth, face index) into one int32 and taking a single max — an
    # argmax+gather pair would cost two more passes over the (P, chunk) array.
    def body(carry, inp):
        best_key = carry
        ci, (coef_c, valid_c) = inp
        vals = jax.lax.dot_general(
            pix, coef_c.transpose(1, 0, 2).reshape(3, chunk * 4),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
            # multiplies in full f32 (free at K=3), only STORAGE is bf16:
            # default-precision bf16 products would noise the near-zero
            # edge values that decide inside/outside (see the z-buffer
            # kernels) — bf16 output keeps their sign, bf16 inputs do not
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(P, chunk, 4)
        b0, b1, b2, iz = vals[..., 0], vals[..., 1], vals[..., 2], vals[..., 3]
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & valid_c[None, :] & (iz > 0)
        # pack: high 21 bits quantized inv-depth, low 11 bits local face id
        izq = jnp.clip(
            (iz.astype(jnp.float32) * 65536.0), 0, float(2**20 - 1)
        ).astype(jnp.int32)
        key = jnp.where(inside, (izq << 11) | jax.lax.broadcasted_iota(
            jnp.int32, (P, chunk), 1
        ), -1)
        local_best = jnp.max(key, axis=1)
        better = local_best > best_key[0]
        best_key = (
            jnp.where(better, local_best, best_key[0]),
            jnp.where(better, ci, best_key[1]),
        )
        return best_key, None

    init = (jnp.full((P,), -1, jnp.int32), jnp.zeros((P,), jnp.int32))
    (best_packed, best_chunk), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks), (coef_chunks, valid_chunks))
    )
    best_face = jnp.where(
        best_packed >= 0, best_chunk * chunk + (best_packed & 0x7FF), -1
    )
    return _winner_outputs(pix, coef, best_face)


def tiled_pair_counts(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    poses: jnp.ndarray,  # (4, 4) or (N, 4, 4)
    H: int,
    W: int,
    focal: float,
    chunk: int = 2048,
):
    """(kept, total) (tile, face-block) pair counts of the tiled z-buffer
    kernel's culling table, with exactly render_mesh's face padding — so
    bench.py can account the raster kernel's FLOPs at the pair count the
    chip actually executes instead of the brute-force bound.

    ``poses`` may be a single (4, 4) camera (returns (int, int)) or a batch
    (N, 4, 4) (returns (list[int], int)): the whole batch is evaluated in
    ONE jitted call with a single host fetch — never sync per camera in a
    loop (CLAUDE.md: ~68 ms per round trip on the remote chip)."""
    from ..ops import raster_zbuffer

    faces = jnp.asarray(faces, jnp.int32)
    F = faces.shape[0]
    pad = (-F) % chunk
    if pad:
        faces = jnp.concatenate([faces, jnp.zeros((pad, 3), jnp.int32)], 0)
    valid_faces = jnp.arange(faces.shape[0]) < F
    poses = jnp.asarray(poses)
    single = poses.ndim == 2
    if single:
        poses = poses[None]

    def kept_one(pose):
        proj = project_vertices(vertices, pose, H, W, focal)
        _, cvalid, _ = _face_coefficients(proj, faces)
        tab, _, _ = raster_zbuffer.overlap_table(
            valid_faces & cvalid, proj.sx[faces], proj.sy[faces], H, W
        )
        return jnp.sum(tab)

    kept = np.asarray(jax.jit(jax.vmap(kept_one))(poses))  # one fetch
    n_ty = -(-H // raster_zbuffer.TILE_H)
    n_tx = -(-W // raster_zbuffer.TILE_W)
    n_fb = -(-faces.shape[0] // raster_zbuffer.FBLOCK_T)
    total = n_ty * n_tx * n_fb
    if single:
        return int(kept[0]), total
    return [int(k) for k in kept], total


def _winner_outputs(pix, coef, best_face):
    """Recompute barycentrics AND exact inverse depth for the winning face
    only (cheap gather + dot); the selection keys quantized iz."""
    hit = best_face >= 0
    face_id = jnp.where(hit, best_face, 0)
    win_coef = coef[face_id]  # (P, 3, 4)
    bary = jnp.einsum("pc,pcb->pb", pix, win_coef[..., :3])
    bary = jnp.clip(bary, 0.0, 1.0)
    bary = bary / jnp.maximum(bary.sum(-1, keepdims=True), 1e-12)
    exact_iz = jnp.einsum("pc,pc->p", pix, win_coef[..., 3])
    return jnp.where(hit, best_face, -1), bary, jnp.where(hit, exact_iz, 0.0)


def _sample_texture(texture: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample (P, 2) uv in [0,1] (v up) from an (Ht, Wt, 3) image."""
    Ht, Wt = texture.shape[0], texture.shape[1]
    x = jnp.clip(uv[:, 0], 0.0, 1.0) * (Wt - 1)
    y = (1.0 - jnp.clip(uv[:, 1], 0.0, 1.0)) * (Ht - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, Wt - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, Ht - 2)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    c00 = texture[y0, x0]
    c01 = texture[y0, x0 + 1]
    c10 = texture[y0 + 1, x0]
    c11 = texture[y0 + 1, x0 + 1]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )


def vertex_normals(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted smooth vertex normals via segment-sum scatter."""
    V = vertices.shape[0]
    fv = vertices[faces]  # (F, 3, 3)
    fn = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])  # area-weighted
    n = jnp.zeros((V, 3))
    for i in range(3):
        n = n.at[faces[:, i]].add(fn)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def render_mesh(
    vertices: jnp.ndarray,  # (V, 3) world space
    faces: jnp.ndarray,  # (F, 3) int32 (pad-safe)
    pose: jnp.ndarray,  # (4, 4) camera-to-world
    H: int,
    W: int,
    focal: float,
    vertex_colors: jnp.ndarray | None = None,  # (V, 3) or None -> white
    light_dir: jnp.ndarray | None = None,  # (3,) world; default mirrors nr
    ambient: float = 0.5,
    diffuse: float = 0.5,
    background: float = 0.0,
    chunk: int = 1024,
    face_uvs: jnp.ndarray | None = None,  # (F, 3, 2) per-corner uv in [0,1]
    texture: jnp.ndarray | None = None,  # (Ht, Wt, 3) sampled bilinearly
    normals: jnp.ndarray | None = None,  # (V, 3) precomputed vertex_normals
    face_normals: jnp.ndarray | None = None,  # (F, 3, 3) normals[faces]
    use_kernel: bool | None = None,
    interpret: bool = False,
    carry_shade: bool | None = None,
):
    """Shaded hard rasterization -> dict(rgb (H,W,3), mask (H,W), depth (H,W)).

    With white colors and the default two-sided lambertian term this plays the
    role of the reference's ``render_one_batch`` GT template render
    (models/utils.py:108-125): detached target images for the L1/mask losses.
    """
    faces = jnp.asarray(faces, jnp.int32)
    F = faces.shape[0]
    pad = (-F) % chunk
    if pad:
        faces = jnp.concatenate([faces, jnp.zeros((pad, 3), jnp.int32)], 0)
    valid = jnp.arange(faces.shape[0]) < F

    proj = project_vertices(vertices, pose, H, W, focal)

    # Per-face corner attributes gathered ONCE at F-level, then one P-level
    # row gather per pixel — replaces the legacy two-level gather
    # (tri = faces[fid]; normals[tri]: a (P, 3) index fetch plus a (P, 3, 3)
    # three-index gather). Same values, strictly fewer gathered rows
    # (F=13.8k vs P=65.5k on the GT template). Static meshes rendered every
    # step should pass `face_normals` precomputed so even the F-level
    # gather leaves the step (appearance.py const["template_fn"]).
    if face_normals is None:
        if normals is None:
            # static meshes rendered every step (the GT template) should
            # pass precomputed normals: the 3-way scatter repeats
            # identically per call
            normals = vertex_normals(vertices, faces)
        face_normals = normals[faces]  # (F, 3, 3)
    elif face_normals.shape[0] != faces.shape[0]:  # pad to face padding
        face_normals = jnp.concatenate(
            [face_normals,
             jnp.zeros((faces.shape[0] - face_normals.shape[0], 3, 3))], 0
        )

    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu" or interpret
    if carry_shade is None:
        carry_shade = _CARRY_SHADE
    fused_shade = (
        carry_shade and use_kernel
        and face_uvs is None and vertex_colors is None
    )
    if fused_shade:
        # Fused winner shading: the z-buffer kernel carries the winner's
        # unnormalized interpolated normal out as three extra linear
        # channels, so NOTHING downstream gathers at P-level. Winners pass
        # the inside test (all oriented barys >= 0), so the carried raw-bary
        # combination differs from the XLA path's clipped/normalized-bary
        # one by a positive per-pixel scale only — identical direction after
        # the unit normalization below.
        from ..ops import raster_zbuffer

        coef, cvalid, _ = _face_coefficients(proj, faces)
        v = valid & cvalid
        ncoef = jnp.einsum(
            "fck,fkx->fcx", coef[..., :3], face_normals,
            precision=jax.lax.Precision.HIGHEST,
        )  # (F, 3, 3): x = pix-coef row, last = normal xyz
        face_id, kbary, kiz, n_raw = raster_zbuffer.zbuffer_select_tiled(
            coef, v, proj.sx[faces], proj.sy[faces], H, W,
            carry_bary=True, chan_coef=ncoef, interpret=interpret,
        )
        hit = face_id >= 0
        bary = jnp.clip(kbary, 0.0, 1.0)
        bary = bary / jnp.maximum(bary.sum(-1, keepdims=True), 1e-12)
        inv_z = jnp.where(hit, kiz, 0.0)
        n_pix = n_raw / jnp.maximum(
            jnp.linalg.norm(n_raw, axis=-1, keepdims=True), 1e-12
        )
    else:
        face_id, bary, inv_z = rasterize(
            proj.sx, proj.sy, proj.inv_z, proj.in_front, faces, valid, H, W,
            chunk, use_kernel=use_kernel, interpret=interpret,
        )
        hit = face_id >= 0
        fid = jnp.where(hit, face_id, 0)
        n_pix = jnp.einsum("pb,pbc->pc", bary, face_normals[fid])
        n_pix = n_pix / jnp.maximum(
            jnp.linalg.norm(n_pix, axis=-1, keepdims=True), 1e-12
        )

    if light_dir is None:
        light_dir = jnp.asarray([0.0, 1.0, 0.0])
    light_dir = light_dir / jnp.linalg.norm(light_dir)
    # two-sided lambert so backfacing normals don't go black (nr renders
    # closed meshes where this matches one-sided in practice)
    lambert = jnp.abs(jnp.sum(n_pix * light_dir, axis=-1))
    shade = ambient + diffuse * lambert

    if face_uvs is not None and texture is not None:
        # UV-textured shading (the reference's SURREAL-textured SMPL renders,
        # ShapeGen/utils.py:9-35): barycentric uv + bilinear texture sample
        fuv = jnp.asarray(face_uvs)
        if fuv.shape[0] != faces.shape[0]:  # pad to face padding
            fuv = jnp.concatenate(
                [fuv, jnp.zeros((faces.shape[0] - fuv.shape[0], 3, 2))], 0
            )
        uv = jnp.einsum("pb,pbc->pc", bary, fuv[fid])  # (P, 2)
        c_pix = _sample_texture(texture, uv)
    elif vertex_colors is None:
        # white template: einsum(bary, ones) == bary.sum — the gather and
        # the dot vanish, values exactly equal (bary sums to ~1 post-norm)
        c_pix = jnp.broadcast_to(
            bary.sum(-1, keepdims=True), (bary.shape[0], 3)
        )
    else:
        face_colors = vertex_colors[faces]  # (F, 3, 3), one F-level gather
        c_pix = jnp.einsum("pb,pbc->pc", bary, face_colors[fid])
    rgb = jnp.clip(c_pix * shade[:, None], 0.0, 1.0)
    rgb = jnp.where(hit[:, None], rgb, background)

    depth = jnp.where(hit, 1.0 / jnp.maximum(inv_z, 1e-12), 0.0)
    return {
        "rgb": rgb.reshape(H, W, 3),
        "mask": hit.reshape(H, W),
        "depth": depth.reshape(H, W),
        "face_id": face_id.reshape(H, W),
    }


@functools.partial(jax.jit, static_argnames=("H", "W", "chunk"))
def _soft_core(
    pix, coef, valid, edge_inv_len, iz_face, colors_face, H, W,
    sigma, gamma, background, chunk,
):
    F = coef.shape[0]
    n_chunks = F // chunk
    P = pix.shape[0]

    coef_chunks = coef.reshape(n_chunks, chunk, 3, 4)
    valid_chunks = valid.reshape(n_chunks, chunk)
    scale_chunks = edge_inv_len.reshape(n_chunks, chunk, 3)
    iz_chunks = iz_face.reshape(n_chunks, chunk)
    col_chunks = colors_face.reshape(n_chunks, chunk, 3)

    eps = 1e-20

    def body(carry, inp):
        sil_prod, num, den = carry
        coef_c, valid_c, scale_c, izf, colf = inp
        # HIGHEST precision, K=3 so full f32 is free: a default-precision
        # (P,3)x(3,4*chunk) matmul runs bf16 passes on TPU and puts ~0.1-1 px
        # of error on every edge distance — at sigma 0.5 that flips boundary
        # sigmoids (measured chip-XLA grad relnorm 290 / cos -0.09 vs CPU at
        # 224^2 x 13.8k faces; docs/PROFILE.md round 5).
        vals = jax.lax.dot_general(
            pix, coef_c.transpose(1, 0, 2).reshape(3, chunk * 4),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(P, chunk, 4)
        bary = vals[..., :3]  # normalized edge values (inside => all >= 0)
        # signed pixel distance to the triangle ~ min over edges of
        # (bary * 2*area / edge_len)
        d = jnp.min(bary * scale_c[None], axis=-1)  # (P, chunk)
        prob = jax.nn.sigmoid(d / sigma)
        prob = jnp.where(valid_c[None], prob, 0.0)
        sil_prod = sil_prod * jnp.prod(1.0 - prob, axis=1)

        w = prob * jnp.exp(jnp.clip(izf[None] / gamma, -60.0, 60.0))
        num = num + jnp.einsum(
            "pf,fc->pc", w, colf, precision=jax.lax.Precision.HIGHEST
        )
        den = den + jnp.sum(w, axis=1)
        return (sil_prod, num, den), None

    init = (jnp.ones((P,)), jnp.zeros((P, 3)), jnp.zeros((P,)))
    # The scan body is rematerialized in the backward: without jax.checkpoint
    # autodiff saves ~7 (P, chunk) residual tensors PER STEP across the whole
    # scan — O(P x F) per view, a 135.29 GB HBM program at the pose/motion
    # optimizers' reference scale (5 views x 224^2, found round 4,
    # docs/VALIDATION.md). Checkpointing saves only the O(P) carries per step
    # and recomputes the chunk's edge matmul + sigmoid in the backward —
    # peak memory O(P x chunk), cost one extra tiny (P,3)@(3,4*chunk) matmul
    # per chunk. Guard test: tests/test_raster.py
    # test_soft_backward_memory_is_chunk_bounded.
    (sil_prod, num, den), _ = jax.lax.scan(
        jax.checkpoint(body),
        init, (coef_chunks, valid_chunks, scale_chunks, iz_chunks, col_chunks)
    )
    silhouette = 1.0 - sil_prod
    w_bg = jnp.exp(jnp.asarray(0.0) / gamma)  # background at inv_z = 0
    rgb = (num + w_bg * background) / (den[:, None] + w_bg + eps)
    return rgb.reshape(H, W, 3), silhouette.reshape(H, W)


def soft_render_mesh(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    pose: jnp.ndarray,
    H: int,
    W: int,
    focal: float,
    vertex_colors: jnp.ndarray | None = None,
    light_dir: jnp.ndarray | None = None,
    ambient: float = 0.5,
    diffuse: float = 0.5,
    sigma: float = 1.0,
    gamma: float = 0.005,
    background: float = 0.0,
    chunk: int = 1024,
    use_kernel: bool | None = None,
    interpret: bool = False,
):
    """Differentiable SoftRas-style render -> dict(rgb, silhouette).

    Gradients flow to ``vertices`` through the edge-distance sigmoids and the
    depth softmax; used by PoseOptimizer/VPoserOptimizer which differentiate
    the CLIP score through the renderer (pose_generation.py:120-127).
    ``sigma`` is in pixels; ``gamma`` tempers depth blending.

    On TPU the (pixel x face) aggregation runs as the fused Pallas kernel
    pair (ops/fused_soft.py: tile-culled forward + transposed-grid custom
    VJP — the XLA scan backward alone was 232 ms/view at 224^2 on v5e);
    elsewhere the checkpointed-scan XLA path (_soft_core) is used.
    """
    faces = jnp.asarray(faces, jnp.int32)
    F = faces.shape[0]
    pad = (-F) % chunk
    if pad:
        faces = jnp.concatenate([faces, jnp.zeros((pad, 3), jnp.int32)], 0)
    valid_pad = jnp.arange(faces.shape[0]) < F

    proj = project_vertices(vertices, pose, H, W, focal)
    coef, cvalid, edge_inv_len = _face_coefficients(proj, faces)
    valid = valid_pad & cvalid

    # per-face flat shading (cheap; soft blending smooths it out)
    fv = vertices[faces]
    fn = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    fn = fn / jnp.sqrt(jnp.sum(fn * fn, axis=-1, keepdims=True) + 1e-12)
    if light_dir is None:
        light_dir = jnp.asarray([0.0, 1.0, 0.0])
    light_dir = light_dir / jnp.linalg.norm(light_dir)
    lambert = jnp.abs(fn @ light_dir)
    shade = ambient + diffuse * lambert
    if vertex_colors is None:
        base = jnp.ones((faces.shape[0], 3))
    else:
        base = vertex_colors[faces].mean(axis=1)
    colors_face = jnp.clip(base * shade[:, None], 0.0, 1.0)

    iz_face = (
        proj.inv_z[faces[:, 0]] + proj.inv_z[faces[:, 1]] + proj.inv_z[faces[:, 2]]
    ) / 3.0

    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if use_kernel:
        from ..ops import fused_soft

        sil_prod, num, den = fused_soft.soft_aggregate(
            coef, valid, edge_inv_len, iz_face, colors_face,
            H, W, sigma, gamma,
            face_sx=proj.sx[faces], face_sy=proj.sy[faces],
            interpret=interpret,
        )
        eps = 1e-20
        w_bg = jnp.exp(jnp.asarray(0.0) / gamma)  # background at inv_z = 0
        rgb = (num + w_bg * background) / (den[:, None] + w_bg + eps)
        return {
            "rgb": rgb.reshape(H, W, 3),
            "silhouette": (1.0 - sil_prod).reshape(H, W),
        }

    pix = _pixel_matrix(H, W)
    rgb, sil = _soft_core(
        pix, coef, valid, edge_inv_len, iz_face, colors_face, H, W,
        sigma, gamma, background, chunk,
    )
    return {"rgb": rgb, "silhouette": sil}
