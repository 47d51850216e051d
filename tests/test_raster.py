import numpy as np
import jax
import jax.numpy as jnp

from avatarclip_tpu.render import cameras, raster


def look_at_pose(eye, at=(0.0, 0.0, 0.0)):
    return cameras.lookat(jnp.asarray(eye), jnp.asarray(at), jnp.asarray([0.0, 1.0, 0.0]))


def test_lookat_properties():
    pose = np.asarray(look_at_pose([0.0, 0.5, 2.0], [0.0, 0.1, 0.0]))
    R = pose[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(pose[:3, 3], [0.0, 0.5, 2.0], atol=1e-6)
    # camera z axis points from at to eye
    z = pose[:3, 2]
    expected = np.array([0.0, 0.4, 2.0])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(z, expected, atol=1e-6)


def test_pixel_grid_rays_unit_norm_and_center():
    pose = look_at_pose([0.0, 0.0, 2.0])
    H = W = 32
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))
    rays_o, rays_d = cameras.pixel_grid_rays(pose, H, W, focal)
    norms = np.linalg.norm(np.asarray(rays_d), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # center pixel looks toward origin (-z from the eye)
    center = np.asarray(rays_d[H // 2, W // 2])
    assert center[2] < -0.99


def test_near_far_from_sphere():
    rays_o = jnp.array([[0.0, 0.0, 2.0]])
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    near, far = cameras.near_far_from_sphere(rays_o, rays_d)
    np.testing.assert_allclose(np.asarray(near), [[1.0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(far), [[3.0]], atol=1e-6)


def test_camera_sampling_distributions():
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    eyes = np.stack([np.asarray(cameras.random_eye_normal(k)[0]) for k in keys[:50]])
    d = np.linalg.norm(eyes, axis=-1)
    assert d.min() >= 1.0 and d.max() <= 2.0
    ats = np.stack([np.asarray(cameras.random_at(k)) for k in keys[:50]])
    assert np.abs(ats).max() <= 0.3
    eye, theta, phi, front = cameras.random_eye(
        keys[0], is_front=1, distance=0.4, theta_std=np.pi / 12
    )
    np.testing.assert_allclose(np.linalg.norm(np.asarray(eye)), 0.4, atol=1e-5)
    assert int(front) == 1


def test_dilate_mask_matches_scipy():
    from scipy import ndimage

    m = np.zeros((64, 64), bool)
    m[30:34, 28:30] = True
    ours = np.asarray(cameras.dilate_mask(jnp.asarray(m), iterations=10))
    struct = ndimage.generate_binary_structure(2, 2)
    ref = ndimage.binary_dilation(m, structure=struct, iterations=10)
    np.testing.assert_array_equal(ours, ref)


def test_select_silhouette_rays_budget():
    m = jnp.zeros((64, 64), bool).at[20:40, 25:35].set(True)
    idx, dilated, sel = cameras.select_silhouette_rays(
        jax.random.PRNGKey(0), m, n_rays=256, dilate_iters=3
    )
    assert idx.shape == (256,)
    assert len(np.unique(np.asarray(idx))) == 256
    # dilated mask has 26*16=416 > 256 px: every selected ray is inside it
    flat = np.asarray(dilated).reshape(-1)
    assert flat[np.asarray(idx)].all()
    # over-budget case: all in-mask pixels get selected, remainder outside
    idx2, dilated2, _ = cameras.select_silhouette_rays(
        jax.random.PRNGKey(1), m, n_rays=1024, dilate_iters=3
    )
    flat2 = np.asarray(dilated2).reshape(-1)
    assert flat2[np.asarray(idx2)].sum() == flat2.sum()


# ---------------------------------------------------------------------------
# rasterizer
# ---------------------------------------------------------------------------


def unit_quad(z=0.0, half=0.5):
    verts = jnp.asarray(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        jnp.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def test_rasterize_quad_mask_and_depth():
    verts, faces = unit_quad(z=0.0, half=0.5)
    pose = look_at_pose([0.0, 0.0, 2.0])
    H = W = 64
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))
    out = raster.render_mesh(verts, faces, pose, H, W, focal, chunk=64)
    mask = np.asarray(out["mask"])
    # quad half-extent 0.5 at distance 2 with f = 0.5*64/tan(30deg)
    half_px = focal * 0.5 / 2.0
    expect_frac = (2 * half_px) ** 2 / (H * W)
    assert abs(mask.mean() - expect_frac) < 0.02
    # depth at center = 2.0
    depth = np.asarray(out["depth"])
    assert abs(depth[H // 2, W // 2] - 2.0) < 1e-3
    # mask is centered and square-ish
    rows = np.where(mask.any(1))[0]
    cols = np.where(mask.any(0))[0]
    assert abs((rows.min() + rows.max()) / 2 - H / 2) < 1.5
    assert abs((cols.min() + cols.max()) / 2 - W / 2) < 1.5


def test_rasterize_occlusion_order():
    # two quads, red in front (z=0.5), blue behind (z=-0.5)
    vf, ff = unit_quad(z=0.5, half=0.3)
    vb, fb = unit_quad(z=-0.5, half=0.3)
    verts = jnp.concatenate([vf, vb], axis=0)
    faces = np.concatenate([ff, fb + 4], axis=0)
    colors = jnp.asarray(
        [[1, 0, 0]] * 4 + [[0, 0, 1]] * 4, jnp.float32
    )
    pose = look_at_pose([0.0, 0.0, 2.0])
    H = W = 32
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))
    out = raster.render_mesh(
        verts, faces, pose, H, W, focal, vertex_colors=colors, ambient=1.0,
        diffuse=0.0, chunk=64,
    )
    rgb = np.asarray(out["rgb"])
    center = rgb[H // 2, W // 2]
    assert center[0] > 0.9 and center[2] < 0.1  # red wins
    depth = np.asarray(out["depth"])
    assert abs(depth[H // 2, W // 2] - 1.5) < 1e-3


def test_rasterize_agrees_with_ray_convention():
    """A vertex placed along a known pixel ray must rasterize to that pixel."""
    pose = look_at_pose([0.0, 0.0, 2.0])
    H = W = 64
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))
    rays_o, rays_d = cameras.pixel_grid_rays(pose, H, W, focal)
    px, py = 40, 22
    p_world = np.asarray(rays_o[py, px] + 1.7 * rays_d[py, px])
    # tiny triangle around that point, facing the camera
    verts = jnp.asarray(
        [
            p_world + np.array([-0.02, -0.02, 0]),
            p_world + np.array([0.02, -0.02, 0]),
            p_world + np.array([0.0, 0.03, 0]),
        ],
        jnp.float32,
    )
    faces = np.array([[0, 1, 2]], np.int32)
    out = raster.render_mesh(verts, faces, pose, H, W, focal, chunk=64)
    mask = np.asarray(out["mask"])
    ys, xs = np.where(mask)
    assert len(ys) > 0
    assert abs(xs.mean() - px) < 1.2
    assert abs(ys.mean() - py) < 1.2


def test_soft_render_matches_hard_silhouette():
    verts, faces = unit_quad(z=0.0, half=0.5)
    pose = look_at_pose([0.0, 0.0, 2.0])
    H = W = 64
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))
    hard = raster.render_mesh(verts, faces, pose, H, W, focal, chunk=64)
    soft = raster.soft_render_mesh(
        verts, faces, pose, H, W, focal, sigma=0.3, chunk=64
    )
    sil = np.asarray(soft["silhouette"])
    mask = np.asarray(hard["mask"]).astype(np.float32)
    # interiors/backgrounds agree; only a thin boundary band differs
    assert np.abs((sil > 0.5).astype(np.float32) - mask).mean() < 0.02


def test_soft_render_gradients_flow_to_vertices():
    verts, faces = unit_quad(z=0.0, half=0.4)
    pose = look_at_pose([0.0, 0.0, 2.0])
    H = W = 32
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))

    def loss(v):
        out = raster.soft_render_mesh(v, faces, pose, H, W, focal, sigma=1.0, chunk=64)
        return jnp.sum(out["silhouette"])

    g = jax.grad(loss)(verts)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).sum() > 1e-3
    # growing the quad increases silhouette area: gradient wrt outward
    # x-coordinate of right-side vertices should be positive
    assert g[1, 0] > 0 and g[2, 0] > 0


def test_render_smpl_template_nonempty():
    from avatarclip_tpu import assets

    model = assets.load_smpl()
    v = np.asarray(model.v_template) @ cameras.BODY_TO_WORLD.T
    pose = look_at_pose([0.0, 0.0, 2.2])
    H = W = 128
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))
    out = raster.render_mesh(
        jnp.asarray(v), model.faces, pose, H, W, focal, chunk=1024
    )
    mask = np.asarray(out["mask"])
    assert 0.02 < mask.mean() < 0.6
    rgb = np.asarray(out["rgb"])
    assert rgb[mask].mean() > 0.3


def test_grid_rays_match_random_rays_offaxis():
    """pixel_grid_rays and the random-pixel sampler must produce identical
    rays for the same pixels, including ROTATED cameras (a transposed
    rotation is invisible at identity poses — regression for that bug)."""
    from avatarclip_tpu.pipelines.dataset import sample_random_rays

    eye = np.array([1.4, 0.8, -1.2], np.float32)
    pose = look_at_pose(eye, [0.1, -0.2, 0.3])
    H = W = 32
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))
    rays_o_g, rays_d_g = cameras.pixel_grid_rays(pose, H, W, focal)

    images = jnp.zeros((1, H, W, 3))
    masks = jnp.zeros((1, H, W))
    poses = pose[None]
    # reproduce the same sampled pixels deterministically
    key = jax.random.PRNGKey(7)
    ro, rd, _, _ = sample_random_rays(images, masks, poses, focal, key, 0, 16)
    k1, k2 = jax.random.split(key)
    px = jax.random.randint(k1, (16,), 0, W)
    py = jax.random.randint(k2, (16,), 0, H)
    # grid rays at integer pixel coords (grid uses the same linspace 0..W-1)
    np.testing.assert_allclose(
        np.asarray(rd)[0], np.asarray(rays_d_g[py[0], px[0]]), atol=1e-5
    )
    for i in range(16):
        np.testing.assert_allclose(
            np.asarray(rd[i]), np.asarray(rays_d_g[py[i], px[i]]), atol=1e-5
        )
    np.testing.assert_allclose(np.asarray(ro[0]), eye, atol=1e-6)


def test_raster_agrees_with_rays_offaxis():
    """Raster/ray agreement at a rotated camera (not just identity)."""
    eye = np.array([1.2, 0.9, 1.1], np.float32)
    pose = look_at_pose(eye)
    H = W = 64
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))
    rays_o, rays_d = cameras.pixel_grid_rays(pose, H, W, focal)
    px, py = 44, 18
    p_world = np.asarray(rays_o[py, px] + 1.6 * rays_d[py, px])
    n = np.asarray(rays_d[py, px])
    # tiny triangle at that point, oriented facing the camera
    u = np.cross(n, [0, 1, 0]); u /= np.linalg.norm(u)
    v = np.cross(n, u)
    verts = jnp.asarray(
        [p_world - 0.02 * u - 0.02 * v, p_world + 0.02 * u - 0.02 * v,
         p_world + 0.03 * v], jnp.float32,
    )
    faces = np.array([[0, 1, 2]], np.int32)
    out = raster.render_mesh(verts, faces, pose, H, W, focal, chunk=64)
    mask = np.asarray(out["mask"])
    ys, xs = np.where(mask)
    assert len(ys) > 0
    assert abs(xs.mean() - px) < 1.2
    assert abs(ys.mean() - py) < 1.2


def test_uv_textured_render():
    """UV texture sampling: a quad textured with a horizontal gradient."""
    verts, faces = unit_quad(z=0.0, half=0.5)
    face_uvs = jnp.asarray(
        [
            [[0, 0], [1, 0], [1, 1]],
            [[0, 0], [1, 1], [0, 1]],
        ],
        jnp.float32,
    )
    tex = jnp.broadcast_to(
        jnp.linspace(0.0, 1.0, 32)[None, :, None], (32, 32, 3)
    )
    pose = look_at_pose([0.0, 0.0, 2.0])
    H = W = 64
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))
    out = raster.render_mesh(
        verts, faces, pose, H, W, focal, face_uvs=face_uvs, texture=tex,
        ambient=1.0, diffuse=0.0, chunk=64,
    )
    rgb = np.asarray(out["rgb"])
    mask = np.asarray(out["mask"])
    rows = np.where(mask.any(1))[0]
    cols = np.where(mask.any(0))[0]
    mid = rows[len(rows) // 2]
    left = rgb[mid, cols.min() + 1, 0]
    right = rgb[mid, cols.max() - 1, 0]
    # u=0 maps to the left of the quad as seen... the gradient must span
    assert abs(right - left) > 0.7
    interior = rgb[mask]
    assert interior.min() >= 0 and interior.max() <= 1


def test_zbuffer_kernel_matches_scan_path():
    """The fused Pallas z-buffer kernel (ops/raster_zbuffer.py, interpret
    mode here) must agree with the chunked-scan XLA path: identical coverage
    mask, and any winner disagreements only among (quantization-)tied or
    bf16-borderline faces — the recomputed exact inverse depths of the two
    winners must be close."""
    import math

    from avatarclip_tpu.ops import raster_zbuffer

    n = 16
    verts, faces = [], []
    for i in range(n + 1):
        for j in range(n):
            th, ph = math.pi * i / n, 2 * math.pi * j / n
            verts.append([
                0.5 * math.sin(th) * math.cos(ph),
                0.5 * math.cos(th),
                0.5 * math.sin(th) * math.sin(ph),
            ])
    for i in range(n):
        for j in range(n):
            a, b = i * n + j, i * n + (j + 1) % n
            c, d = (i + 1) * n + j, (i + 1) * n + (j + 1) % n
            faces += [[a, b, c], [b, d, c]]
    verts = jnp.asarray(np.array(verts, np.float32))
    fj = jnp.asarray(np.array(faces, np.int32))
    pose = cameras.lookat(
        jnp.array([0.2, 0.1, 1.4]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    H = W = 48
    proj = raster.project_vertices(verts, pose, H, W, 48.0)
    valid = jnp.ones((fj.shape[0],), bool)
    coef, cvalid, _ = raster._face_coefficients(proj, fj)
    pix = raster._pixel_matrix(H, W)

    bf_k = raster_zbuffer.zbuffer_select(pix, coef, valid & cvalid, interpret=True)
    fid_x, _, _ = raster.rasterize(
        proj.sx, proj.sy, proj.inv_z, proj.in_front, fj, valid, H, W,
        chunk=128, use_kernel=False,
    )
    fk, fx = np.asarray(bf_k), np.asarray(fid_x)
    hit_k, hit_x = fk >= 0, fx >= 0
    np.testing.assert_array_equal(hit_k, hit_x)  # identical coverage
    both = hit_k & hit_x
    agree = (fk == fx)[both].mean()
    assert agree > 0.97, f"winner agreement {agree}"
    iz = lambda f: np.asarray(
        jnp.einsum("pc,pc->p", pix, coef[jnp.asarray(np.clip(f, 0, None))][..., 3])
    )
    gap = np.abs(iz(fk) - iz(fx))[(fk != fx) & both]
    if gap.size:
        assert np.median(gap) < 1e-2, f"median winner depth gap {np.median(gap)}"


def test_zbuffer_kernel_close_camera_ordering():
    """Regression (ADVICE r2): the kernel's packed inv-depth key used to
    saturate at inv_z = 4 (depth 0.25) — a face camera at distance ~0.2 put
    ALL geometry in the saturated band and the winner degenerated to
    highest-face-id. The kernel now orders by EXACT f32 inverse depth (no
    quantization, no saturation); at depths in (1/16, 1/4) it must agree
    with the XLA path's ordering."""
    import math

    from avatarclip_tpu.ops import raster_zbuffer

    # small sphere, very close camera: depths ~0.13..0.23 (inv_z ~4.3..7.7)
    n = 16
    verts, faces = [], []
    for i in range(n + 1):
        for j in range(n):
            th, ph = math.pi * i / n, 2 * math.pi * j / n
            verts.append([
                0.05 * math.sin(th) * math.cos(ph),
                0.05 * math.cos(th),
                0.05 * math.sin(th) * math.sin(ph),
            ])
    for i in range(n):
        for j in range(n):
            a, b = i * n + j, i * n + (j + 1) % n
            c, d = (i + 1) * n + j, (i + 1) * n + (j + 1) % n
            faces += [[a, b, c], [b, d, c]]
    verts = jnp.asarray(np.array(verts, np.float32))
    fj = jnp.asarray(np.array(faces, np.int32))
    pose = cameras.lookat(
        jnp.array([0.02, 0.01, 0.18]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    H = W = 48
    proj = raster.project_vertices(verts, pose, H, W, 64.0)
    valid = jnp.ones((fj.shape[0],), bool)
    coef, cvalid, _ = raster._face_coefficients(proj, fj)
    pix = raster._pixel_matrix(H, W)

    bf_k = raster_zbuffer.zbuffer_select(pix, coef, valid & cvalid, interpret=True)
    fid_x, _, _ = raster.rasterize(
        proj.sx, proj.sy, proj.inv_z, proj.in_front, fj, valid, H, W,
        chunk=128, use_kernel=False,
    )
    fk, fx = np.asarray(bf_k), np.asarray(fid_x)
    hit_k, hit_x = fk >= 0, fx >= 0
    np.testing.assert_array_equal(hit_k, hit_x)
    both = hit_k & hit_x
    assert both.sum() > 100  # the sphere actually covers pixels
    agree = (fk == fx)[both].mean()
    assert agree > 0.97, f"close-camera winner agreement {agree}"


def test_render_mesh_precomputed_normals_bit_identical():
    """render_mesh(normals=vertex_normals(v, f)) must be bit-identical to
    the internally-computed path — the train step hoists the template's
    step-invariant normals out of the jitted GT render."""
    rng = np.random.default_rng(3)
    V, F = 500, 1200
    verts = jnp.asarray(rng.normal(0, 0.4, (V, 3)).astype(np.float32))
    fj = jnp.asarray(rng.integers(0, V, (F, 3)).astype(np.int32))
    pose = cameras.lookat(
        jnp.array([0.0, 0.0, 1.8]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    a = raster.render_mesh(verts, fj, pose, 96, 96, 90.0)
    n = raster.vertex_normals(verts, fj)
    b = raster.render_mesh(verts, fj, pose, 96, 96, 90.0, normals=n)
    assert int(np.asarray(a["mask"]).sum()) > 1000
    for k in ("rgb", "mask", "depth", "face_id"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    # precomputed per-face corner normals (the hoisted single-gather path
    # the train step uses via const["template_fn"]) — same gathered values,
    # so bit-identical too
    c = raster.render_mesh(
        verts, fj, pose, 96, 96, 90.0, face_normals=n[fj]
    )
    for k in ("rgb", "mask", "depth", "face_id"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(c[k]))


def test_zbuffer_tiled_carry_bary_matches_winner_outputs():
    """carry_bary=True must return the same winners plus barycentrics /
    exact inverse depth equal to _winner_outputs' coef-gather recompute
    (same f32 dots: in-kernel MXU vs the out-of-kernel einsum), including
    zeroed outputs at background pixels."""
    from avatarclip_tpu.ops import raster_zbuffer

    rng = np.random.default_rng(19)
    V, F = 300, raster_zbuffer.FBLOCK_T + 101
    verts = jnp.asarray(rng.normal(0.0, 0.35, (V, 3)).astype(np.float32))
    fj = jnp.asarray(rng.integers(0, V, (F, 3)).astype(np.int32))
    pose = cameras.lookat(
        jnp.array([0.1, -0.2, 1.5]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    H, W = 50, 70  # non-multiples of the 32-px tiles
    proj = raster.project_vertices(verts, pose, H, W, 60.0)
    coef, cvalid, _ = raster._face_coefficients(proj, fj)
    pix = raster._pixel_matrix(H, W)

    fid_ref = raster_zbuffer.zbuffer_select_tiled(
        coef, cvalid, proj.sx[fj], proj.sy[fj], H, W, interpret=True
    )
    fid_ref, bary_ref, iz_ref = raster._winner_outputs(pix, coef, fid_ref)

    fid_c, kbary, kiz = raster_zbuffer.zbuffer_select_tiled(
        coef, cvalid, proj.sx[fj], proj.sy[fj], H, W, interpret=True,
        carry_bary=True,
    )
    np.testing.assert_array_equal(np.asarray(fid_c), np.asarray(fid_ref))
    hit = np.asarray(fid_c) >= 0
    assert hit.sum() > 50
    # same normalization as rasterize's carry_bary branch
    bary_c = np.clip(np.asarray(kbary), 0.0, 1.0)
    bary_c = bary_c / np.maximum(bary_c.sum(-1, keepdims=True), 1e-12)
    np.testing.assert_allclose(
        bary_c[hit], np.asarray(bary_ref)[hit], rtol=0, atol=1e-5
    )
    iz_c = np.where(hit, np.asarray(kiz), 0.0)
    # in-kernel dot vs out-of-kernel einsum: association differs by ~1 ulp
    np.testing.assert_allclose(
        iz_c[hit], np.asarray(iz_ref)[hit], rtol=1e-5, atol=0
    )
    # background pixels: bary zeros, iz sentinel mapped to 0
    assert (bary_c[~hit] == 0.0).all()
    assert (iz_c[~hit] == 0.0).all()


def test_rasterize_carry_bary_end_to_end():
    """rasterize(use_kernel=True/interpret) with carry_bary must agree with
    the legacy recompute path on face ids, barycentrics, and depth."""
    import avatarclip_tpu.ops.raster_zbuffer as rz

    rng = np.random.default_rng(23)
    V, F = 200, 256
    verts = jnp.asarray(rng.normal(0.0, 0.35, (V, 3)).astype(np.float32))
    fj = jnp.asarray(rng.integers(0, V, (F, 3)).astype(np.int32))
    pose = cameras.lookat(
        jnp.array([0.0, 0.1, 1.6]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    H = W = 48
    proj = raster.project_vertices(verts, pose, H, W, 60.0)
    valid = jnp.ones((F,), bool)

    # kernel path needs interpret off-TPU: monkeypatch via the direct call
    coef, cvalid, _ = raster._face_coefficients(proj, fj)
    pix = raster._pixel_matrix(H, W)
    fid0 = rz.zbuffer_select_tiled(
        coef, valid & cvalid, proj.sx[fj], proj.sy[fj], H, W, interpret=True
    )
    fid_l, bary_l, iz_l = raster._winner_outputs(pix, coef, fid0)

    fid_k, kbary, kiz = rz.zbuffer_select_tiled(
        coef, valid & cvalid, proj.sx[fj], proj.sy[fj], H, W,
        interpret=True, carry_bary=True,
    )
    hit = np.asarray(fid_k) >= 0
    bary_k = jnp.clip(kbary, 0.0, 1.0)
    bary_k = bary_k / jnp.maximum(bary_k.sum(-1, keepdims=True), 1e-12)
    iz_k = jnp.where(fid_k >= 0, kiz, 0.0)
    np.testing.assert_array_equal(np.asarray(fid_k), np.asarray(fid_l))
    np.testing.assert_allclose(
        np.asarray(bary_k)[hit], np.asarray(bary_l)[hit], atol=1e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(iz_k)[hit], np.asarray(iz_l)[hit], rtol=1e-5, atol=0
    )


def test_degenerate_slivers_are_gated_not_rasterized():
    """Edge-on sliver faces must be gated by the pixel-scale area threshold
    (_face_coefficients _MIN_AREA2), not rasterized: with the old 1e-12
    gate a |area2| ~ 1e-4 px^2 face got inv_area ~ 1e4, its coef entries
    ~1e5+, and the half-plane test lost boundedness to fp noise — on the
    real chip (bf16 dot passes) such faces rasterized as screen-crossing
    white lines and poisoned the round-5 chain's 108 NeuS-init views
    (pretrain mask IoU 0.57 vs ~0.99 on clean data)."""
    # three nearly-collinear points: projected area far below 1e-3 px^2
    verts = jnp.asarray(np.array([
        [-0.5, 0.0, 0.0], [0.5, 0.0, 0.0], [0.0, 1e-7, 0.0],
        # a small but REAL face (~a few px^2) that must survive the gate
        [0.0, 0.3, 0.0], [0.06, 0.3, 0.0], [0.03, 0.36, 0.0],
    ], np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int32))
    pose = cameras.lookat(
        jnp.asarray([0.0, 0.0, 2.2]), jnp.zeros(3),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    H = W = 256
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))
    proj = raster.project_vertices(verts, pose, H, W, focal)
    coef, valid, _ = raster._face_coefficients(proj, faces)
    v = np.asarray(valid)
    assert not v[0], "sliver face must be gated invalid"
    assert v[1], "small real face must stay valid"
    out = raster.render_mesh(verts, faces, pose, H, W, focal, chunk=64)
    fid = np.asarray(out["face_id"])
    assert not (fid == 0).any(), "gated sliver rasterized pixels"
    # the real face rasterizes, and only within its screen bbox (+1 px)
    hit1 = np.argwhere(fid == 1)
    assert len(hit1) > 0
    sx, sy = np.asarray(proj.sx[faces[1]]), np.asarray(proj.sy[faces[1]])
    assert hit1[:, 1].min() >= sx.min() - 1 and hit1[:, 1].max() <= sx.max() + 1
    assert hit1[:, 0].min() >= sy.min() - 1 and hit1[:, 0].max() <= sy.max() + 1


def test_zbuffer_kernel_matches_numpy_exact_oracle():
    """The pair-carry kernel orders winners by EXACT f32 inverse depth with
    ties to the higher face id — assert it against a brute-force numpy
    reconstruction of that rule (pixel x face loop in f64 on the f32 dot
    results), not just against the (quantized, bf16) XLA scan path."""
    from avatarclip_tpu.ops import raster_zbuffer

    rng = np.random.default_rng(11)
    V, F = 120, 300
    verts = jnp.asarray(rng.normal(0.0, 0.4, (V, 3)).astype(np.float32))
    fj = jnp.asarray(rng.integers(0, V, (F, 3)).astype(np.int32))
    pose = cameras.lookat(
        jnp.array([0.05, -0.1, 1.2]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    H = W = 40
    proj = raster.project_vertices(verts, pose, H, W, 45.0)
    coef, cvalid, _ = raster._face_coefficients(proj, fj)
    pix = raster._pixel_matrix(H, W)

    bf_k = raster_zbuffer.zbuffer_select(pix, coef, cvalid, interpret=True)
    bf_t = raster_zbuffer.zbuffer_select_tiled(
        coef, cvalid, proj.sx[fj], proj.sy[fj], H, W, interpret=True
    )

    # numpy oracle: winner = argmax over inside faces of (f32 iz, face id)
    px = np.asarray(pix, np.float32)  # (P, 3)
    cf = np.asarray(coef, np.float32)  # (F, 3, 4)
    vals = np.einsum("pc,fcb->pfb", px, cf).astype(np.float32)  # (P, F, 4)
    b = vals[..., :3]
    iz = vals[..., 3]
    inside = (b >= 0).all(-1) & (iz > 0) & np.asarray(cvalid)[None, :]
    iz_in = np.where(inside, iz, -1.0)
    best_iz = iz_in.max(axis=1)
    fid = np.arange(F)[None, :]
    cand = np.where((iz_in == best_iz[:, None]) & inside, fid, -1)
    want = np.where(best_iz > 0, cand.max(axis=1), -1)

    assert (want >= 0).sum() > 80
    np.testing.assert_array_equal(np.asarray(bf_k), want)
    np.testing.assert_array_equal(np.asarray(bf_t), want)


def test_zbuffer_tiled_matches_brute_exactly():
    """The tile-binned winner kernel (zbuffer_select_tiled) must produce
    EXACTLY the brute-force kernel's winners — the bbox culling is
    winner-exact (an inside pixel lies within its face's screen bbox), and
    both share the packed key and tie-break. Covers non-multiple-of-tile
    image sizes, non-multiple-of-FBLOCK_T face counts, and faces off
    screen / behind the camera."""
    from avatarclip_tpu.ops import raster_zbuffer

    rng = np.random.default_rng(7)
    V, F = 400, raster_zbuffer.FBLOCK_T + 37
    verts = jnp.asarray(rng.normal(0.0, 0.35, (V, 3)).astype(np.float32))
    # some vertices pushed behind the camera to exercise the in_front gate
    verts = verts.at[:20, 2].add(3.0)
    fj = jnp.asarray(rng.integers(0, V, (F, 3)).astype(np.int32))
    pose = cameras.lookat(
        jnp.array([0.1, -0.2, 1.5]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    for H, W in ((50, 70), (64, 64)):  # non-multiples and multiples of 32
        proj = raster.project_vertices(verts, pose, H, W, 60.0)
        coef, cvalid, _ = raster._face_coefficients(proj, fj)
        pix = raster._pixel_matrix(H, W)
        bf_brute = raster_zbuffer.zbuffer_select(
            pix, coef, cvalid, interpret=True
        )
        bf_tiled = raster_zbuffer.zbuffer_select_tiled(
            coef, cvalid, proj.sx[fj], proj.sy[fj], H, W, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(bf_tiled), np.asarray(bf_brute)
        )
        assert int((np.asarray(bf_brute) >= 0).sum()) > 50


def _dense_soft_reference(verts, faces, pose, H, W, focal, sigma, gamma,
                          background=0.0):
    """O(P x F) no-scan reimplementation of soft_render_mesh's aggregation
    math (single dense einsum instead of the checkpointed lax.scan) — an
    independent oracle for the scan + jax.checkpoint rematerialization."""
    faces = jnp.asarray(faces, jnp.int32)
    proj = raster.project_vertices(verts, pose, H, W, focal)
    coef, cvalid, edge_inv_len = raster._face_coefficients(proj, faces)
    fv = verts[faces]
    fn = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    fn = fn / jnp.sqrt(jnp.sum(fn * fn, axis=-1, keepdims=True) + 1e-12)
    light = jnp.asarray([0.0, 1.0, 0.0])
    shade = 0.5 + 0.5 * jnp.abs(fn @ light)
    colors = jnp.clip(jnp.ones((faces.shape[0], 3)) * shade[:, None], 0, 1)
    iz_face = proj.inv_z[faces].mean(axis=1)

    pix = raster._pixel_matrix(H, W)
    vals = jnp.einsum("pc,fcb->pfb", pix, coef)  # (P, F, 4)
    d = jnp.min(vals[..., :3] * edge_inv_len[None], axis=-1)
    prob = jax.nn.sigmoid(d / sigma)
    prob = jnp.where(cvalid[None], prob, 0.0)
    sil = 1.0 - jnp.prod(1.0 - prob, axis=1)
    w = prob * jnp.exp(jnp.clip(iz_face[None] / gamma, -60.0, 60.0))
    num = w @ colors
    den = w.sum(axis=1)
    w_bg = jnp.exp(jnp.asarray(0.0) / gamma)
    rgb = (num + w_bg * background) / (den[:, None] + w_bg + 1e-20)
    return rgb.reshape(H, W, 3), sil.reshape(H, W)


def test_soft_scan_checkpoint_grad_matches_dense_oracle():
    """Value AND vertex gradient of the (checkpointed-scan) soft renderer
    must match the dense no-scan reference — guards the jax.checkpoint
    rematerialization added after the round-4 135 GB HBM finding."""
    rng = np.random.default_rng(2)
    V, F = 40, 64
    verts0 = jnp.asarray(rng.normal(0, 0.3, (V, 3)).astype(np.float32))
    fj = jnp.asarray(rng.integers(0, V, (F, 3)).astype(np.int32))
    pose = look_at_pose([0.1, -0.1, 1.6])
    H = W = 32
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))
    probe = jnp.asarray(rng.normal(0, 1, (H, W, 3)).astype(np.float32))
    probe_s = jnp.asarray(rng.normal(0, 1, (H, W)).astype(np.float32))

    def loss_scan(v):
        out = raster.soft_render_mesh(
            v, fj, pose, H, W, focal, sigma=0.7, gamma=0.005, chunk=16
        )
        return jnp.sum(out["rgb"] * probe) + jnp.sum(out["silhouette"] * probe_s)

    def loss_dense(v):
        rgb, sil = _dense_soft_reference(
            v, fj, pose, H, W, focal, sigma=0.7, gamma=0.005
        )
        return jnp.sum(rgb * probe) + jnp.sum(sil * probe_s)

    v_s, g_s = jax.value_and_grad(loss_scan)(verts0)
    v_d, g_d = jax.value_and_grad(loss_dense)(verts0)
    np.testing.assert_allclose(float(v_s), float(v_d), rtol=1e-5)
    # f32 accumulation order differs (sequential scan vs one dense einsum)
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_d), rtol=2e-3, atol=1e-4
    )


def test_soft_backward_memory_is_chunk_bounded():
    """Compile (not run) the vertex gradient of a 2-view 224^2 soft render at
    SMPL face count and assert the program's temp memory is O(P x chunk), not
    O(P x F). This is the scale class that produced the 135.29 GB HBM program
    on the TPU in round 4 (pose/motion optimizers, 5 views): pre-fix this
    2-view CPU program assigned 67.5 GiB of temps, post-checkpoint 2.0 GiB."""
    V, F = 6890, 13776
    verts = jax.random.normal(jax.random.PRNGKey(0), (V, 3)) * 0.3
    fj = jax.random.randint(jax.random.PRNGKey(1), (F, 3), 0, V)
    res = 224
    focal = cameras.focal_from_fov(res, np.deg2rad(60.0))

    def loss(v):
        tot = 0.0
        for az in (150.0, 210.0):
            a = jnp.deg2rad(az)
            eye = 2.0 * jnp.stack([jnp.sin(a), jnp.asarray(0.0), -jnp.cos(a)])
            pose = cameras.lookat(eye, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
            out = raster.soft_render_mesh(
                v, fj, pose, res, res, focal, sigma=0.5, chunk=2048
            )
            tot = tot + out["rgb"].sum() + out["silhouette"].sum()
        return tot

    compiled = jax.jit(jax.grad(loss)).lower(verts).compile()
    temp_gib = compiled.memory_analysis().temp_size_in_bytes / 2**30
    assert temp_gib < 8.0, (
        f"soft-raster backward temps {temp_gib:.1f} GiB — the scan residuals "
        "are O(P x F) again (lost jax.checkpoint on the _soft_core body?)"
    )


def test_zbuffer_tiled_chan_coef_carries_linear_channels():
    """chan_coef channels (linear in the pixel, like the barycentrics) must
    come out of the kernel equal to the explicit recompute
    pix @ chan_coef[winner] at hit pixels, zeros at background — the fused
    winner-shading candidate rides interpolated normals on this."""
    from avatarclip_tpu.ops import raster_zbuffer

    rng = np.random.default_rng(31)
    V, F = 300, raster_zbuffer.FBLOCK_T + 77
    verts = jnp.asarray(rng.normal(0.0, 0.35, (V, 3)).astype(np.float32))
    fj = jnp.asarray(rng.integers(0, V, (F, 3)).astype(np.int32))
    pose = cameras.lookat(
        jnp.array([0.1, -0.2, 1.5]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    H, W = 50, 70
    proj = raster.project_vertices(verts, pose, H, W, 60.0)
    coef, cvalid, _ = raster._face_coefficients(proj, fj)
    pix = raster._pixel_matrix(H, W)

    # three arbitrary linear channels (stand-in for the normal coefficients)
    chan = jnp.asarray(rng.normal(0.0, 1.0, (F, 3, 3)).astype(np.float32))

    fid, kbary, kiz, kchan = raster_zbuffer.zbuffer_select_tiled(
        coef, cvalid, proj.sx[fj], proj.sy[fj], H, W, interpret=True,
        carry_bary=True, chan_coef=chan,
    )
    fid_ref = raster_zbuffer.zbuffer_select_tiled(
        coef, cvalid, proj.sx[fj], proj.sy[fj], H, W, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(fid), np.asarray(fid_ref))
    hit = np.asarray(fid) >= 0
    assert hit.sum() > 50
    ref = np.einsum(
        "pc,pcx->px", np.asarray(pix), np.asarray(chan)[np.where(hit, fid, 0)]
    )
    np.testing.assert_allclose(
        np.asarray(kchan)[hit], ref[hit], rtol=1e-5, atol=1e-5
    )
    assert (np.asarray(kchan)[~hit] == 0.0).all()


def test_render_mesh_fused_winner_shading_end_to_end():
    """render_mesh(carry_shade=True) — winner normal carried out of the
    kernel as linear channels, zero P-level gathers — must match the
    legacy kernel path (same winners, recompute shading) on every output."""
    rng = np.random.default_rng(37)
    V, F = 400, 900
    verts = jnp.asarray(rng.normal(0.0, 0.35, (V, 3)).astype(np.float32))
    fj = jnp.asarray(rng.integers(0, V, (F, 3)).astype(np.int32))
    pose = cameras.lookat(
        jnp.array([0.0, 0.1, 1.6]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    H = W = 64
    a = raster.render_mesh(
        verts, fj, pose, H, W, 70.0, use_kernel=True, interpret=True,
        carry_shade=False,
    )
    b = raster.render_mesh(
        verts, fj, pose, H, W, 70.0, use_kernel=True, interpret=True,
        carry_shade=True,
    )
    assert int(np.asarray(a["mask"]).sum()) > 200
    np.testing.assert_array_equal(np.asarray(a["mask"]), np.asarray(b["mask"]))
    np.testing.assert_array_equal(
        np.asarray(a["face_id"]), np.asarray(b["face_id"])
    )
    # winners are inside (all barys >= 0), so the raw-bary carried normal is
    # a positive scale of the clipped/normalized-bary recompute: identical
    # direction after unit normalization, rgb equal to fp noise
    np.testing.assert_allclose(
        np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=3e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(a["depth"]), np.asarray(b["depth"]), rtol=1e-5, atol=1e-6
    )
    # the XLA scan path agrees on coverage (winner ties aside)
    c = raster.render_mesh(verts, fj, pose, H, W, 70.0, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(c["mask"]), np.asarray(b["mask"]))
