"""SAM 3D Body: rotation math, MHR body model, full predict pipeline.

Parity: reference mlx_vlm/models/sam3d_body/*."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.models.sam3d_body import (
    Model,
    SAM3DConfig,
    init_sam3d_params,
)
from mlx_vlm_tpu.models.sam3d_body.estimator import (
    SAM3DPredictor,
    draw_skeleton_overlay,
    get_affine_transform,
    get_cliff_condition,
    make_default_intrinsics,
    prepare_image,
    write_obj,
)
from mlx_vlm_tpu.models.sam3d_body.mhr import (
    cont_to_body_params,
    cont_to_hand_params,
    euler_xyz_to_rotmat,
    mhr_forward,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_euler_zyx,
    rotmat_to_quat,
)

TINY = SAM3DConfig(
    embed_dim=32, depth=2, num_heads=2, head_dim=16, patch_size=16,
    image_size=(64, 48), num_storage_tokens=2,
    decoder_dim=48, decoder_depth=2, decoder_heads=2, decoder_head_dim=16,
    decoder_mlp_dim=48,
    num_joints=8, num_vertices=64, num_faces=16,
    prompt_embed_dim=32,
)


class TestRotations:
    def test_rot6d_roundtrip_orthonormal(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((5, 6)), jnp.float32)
        R = rot6d_to_rotmat(x)
        eye = jnp.einsum("bij,bkj->bik", R, R)
        assert np.allclose(np.asarray(eye), np.eye(3), atol=1e-5)
        det = np.linalg.det(np.asarray(R))
        assert np.allclose(det, 1.0, atol=1e-5)

    def test_quat_rotmat_roundtrip(self):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((7, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        R = quat_to_rotmat(jnp.asarray(q))
        q2 = np.asarray(rotmat_to_quat(R))
        # quaternion double-cover: q and -q are the same rotation
        dots = np.abs((q * q2).sum(-1))
        assert np.allclose(dots, 1.0, atol=1e-4)

    def test_euler_zyx_consistency(self):
        """rotmat -> euler_ZYX -> (Rz@Ry@Rx via xyz euler [x,y,z]=rev) -> same."""
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((4, 6)), jnp.float32)
        R = rot6d_to_rotmat(x)
        zyx = rotmat_to_euler_zyx(R)  # [z, y, x]
        R2 = euler_xyz_to_rotmat(zyx[..., ::-1])  # takes [x, y, z]
        assert np.allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


class TestPoseCodecs:
    def test_body_codec_shape_and_coverage(self):
        rng = np.random.default_rng(3)
        cont = jnp.asarray(rng.standard_normal((2, 260)), jnp.float32)
        out = cont_to_body_params(cont)
        assert out.shape == (2, 133)
        assert np.isfinite(np.asarray(out)).all()
        # translations pass through: last 6 cont dims land at 124..129
        assert np.allclose(np.asarray(out)[:, 124:130],
                           np.asarray(cont)[:, 254:260], atol=1e-6)

    def test_hand_codec(self):
        rng = np.random.default_rng(4)
        cont = jnp.asarray(rng.standard_normal((3, 54)), jnp.float32)
        out = cont_to_hand_params(cont)
        assert out.shape == (3, 27)
        assert np.isfinite(np.asarray(out)).all()


class TestMHRBody:
    def test_fk_chain_and_skinning(self):
        """FK on a simple chain: identity rotations accumulate translation
        offsets down the parent chain; LBS scatters finitely."""
        params = init_sam3d_params(TINY, jax.random.PRNGKey(0))
        bm = params["head_pose"]["body_model"]
        shape = jnp.zeros((1, TINY.num_shape_comps))
        model_params = jnp.zeros((1, 204))
        verts, skel = mhr_forward(bm, shape, model_params,
                                  num_joints=TINY.num_joints,
                                  num_verts=TINY.num_vertices)
        assert verts.shape == (1, TINY.num_vertices, 3)
        assert skel.shape == (1, TINY.num_joints, 8)
        assert np.isfinite(np.asarray(verts)).all()
        # with zero DOFs and identity prerotations, joint j's position is
        # the cumulative sum of translation offsets along the chain 0->j
        offs = np.asarray(bm["joint_translation_offsets"])
        expect = np.cumsum(offs, axis=0)
        assert np.allclose(np.asarray(skel[0, :, :3]), expect, atol=1e-4)

    def test_pose_changes_mesh(self):
        params = init_sam3d_params(TINY, jax.random.PRNGKey(0))
        bm = params["head_pose"]["body_model"]
        shape = jnp.zeros((1, TINY.num_shape_comps))
        v0, _ = mhr_forward(bm, shape, jnp.zeros((1, 204)),
                            num_joints=TINY.num_joints,
                            num_verts=TINY.num_vertices)
        posed = jnp.zeros((1, 204)).at[0, 10].set(0.5)
        v1, _ = mhr_forward(bm, shape, posed,
                            num_joints=TINY.num_joints,
                            num_verts=TINY.num_vertices)
        assert not np.allclose(np.asarray(v0), np.asarray(v1))


class TestFrontend:
    def test_affine_square_pad(self):
        """bbox maps to output with 1.2x square padding around center."""
        M = get_affine_transform(np.asarray([50.0, 50.0]),
                                 np.asarray([40.0, 20.0]), (48, 64))
        # center maps to output center
        c = M @ np.asarray([50.0, 50.0, 1.0])
        assert np.allclose(c, [24.0, 32.0], atol=1e-4)
        # center + crop/2 in x maps to right edge (crop = 40 * 1.2)
        r = M @ np.asarray([50.0 + 24.0, 50.0, 1.0])
        assert np.allclose(r, [48.0, 32.0], atol=1e-4)

    def test_prepare_image(self):
        img = (np.random.default_rng(0).uniform(
            0, 255, (100, 80, 3))).astype(np.uint8)
        out = prepare_image(img, [10, 10, 70, 90], image_size=(64, 48))
        assert out.shape == (1, 64, 48, 3) and out.dtype == np.float32

    def test_cliff_condition(self):
        c = get_cliff_condition([0, 0, 100, 200], (400, 300))
        f = np.sqrt(400 ** 2 + 300 ** 2)
        assert np.allclose(c, [(50 - 150) / f, (100 - 200) / f, 125 / f])

    def test_intrinsics(self):
        k = make_default_intrinsics(400, 300)
        assert k[0, 0] == pytest.approx(500.0) and k[0, 2] == 150.0


class TestEndToEnd:
    def test_predict_pipeline(self, tmp_path):
        """Full predict: crop -> backbone -> decoder w/ per-layer MHR
        refinement -> mesh + keypoints + camera; plus OBJ export and
        skeleton overlay."""
        model = Model(TINY)
        params = init_sam3d_params(TINY, jax.random.PRNGKey(0))
        pred = SAM3DPredictor(model, params)
        img = (np.random.default_rng(1).uniform(
            0, 255, (120, 90, 3))).astype(np.uint8)
        out = pred.predict(img, bbox=[10, 10, 80, 110])
        assert out["pred_vertices"].shape == (TINY.num_vertices, 3)
        assert out["pred_keypoints_3d"].shape == (
            TINY.num_point_embeddings, 3)
        assert out["pred_camera"].shape == (3,)
        assert np.isfinite(out["pred_vertices"]).all()

        write_obj(out["pred_vertices"], None, str(tmp_path / "m.obj"))
        assert (tmp_path / "m.obj").read_text().startswith("v ")
        kp2d = np.random.default_rng(2).uniform(0, 90, (70, 2))
        overlay = draw_skeleton_overlay(img, kp2d)
        assert overlay.shape == img.shape
        assert (overlay != img).any()

    def test_predict_without_bbox_uses_full_frame(self):
        model = Model(TINY)
        params = init_sam3d_params(TINY, jax.random.PRNGKey(0))
        pred = SAM3DPredictor(model, params)
        img = np.zeros((64, 48, 3), np.uint8)
        out = pred.predict(img)
        assert out["bbox"] == [0, 0, 48, 64]

    def test_forward_no_rays(self):
        """cam_int=None path: no ray conditioning, projection skipped."""
        model = Model(TINY)
        params = init_sam3d_params(TINY, jax.random.PRNGKey(0))
        img = jnp.asarray(np.random.default_rng(3).standard_normal(
            (1, 64, 48, 3)) * 0.1, jnp.float32)
        body, cam = model(params, img)
        assert body["pred_vertices"].shape == (1, TINY.num_vertices, 3)
        assert cam.shape == (1, 3)

    def test_sanitize_remaps(self):
        """mhr./point_embeddings/conv keys remap per the reference tables."""
        w = {
            "mhr.character.skeleton.joint_parents": np.zeros(3, np.int32),
            "mhr.character.mesh.faces": np.zeros((4, 3)),  # skipped
            "prompt_encoder.point_embeddings.1.weight": np.ones((1, 8)),
            "prompt_encoder.point_embeddings.0.weight": np.zeros((1, 8)),
            "backbone.patch_embed.projection.weight":
                np.zeros((16, 3, 4, 4)),
        }
        out = Model.sanitize(w)
        assert "head_pose.body_model.joint_parents" in out
        assert not any("mesh.faces" in k for k in out)
        table = out["prompt_encoder.point_embeddings.weight"]
        assert table.shape == (2, 8) and table[1].sum() == 8
        assert out["backbone.patch_embed.projection.weight"].shape == (
            4, 4, 3, 16)


class TestVideo:
    def test_iou_and_tracking(self):
        from mlx_vlm_tpu.models.sam3d_body.video import bbox_iou, track_person

        assert bbox_iou([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)
        assert bbox_iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
        dets = [[0, 0, 50, 50], [100, 100, 120, 130]]
        # matches by IoU with the previous box
        assert track_person(dets, [98, 102, 121, 128]) == dets[1]
        # lost track -> largest (first) detection
        assert track_person(dets, [500, 500, 510, 510]) == dets[0]
        assert track_person([], [0, 0, 1, 1]) is None
        assert track_person(dets, None) == dets[0]

    def test_perspective_projection_center(self):
        from mlx_vlm_tpu.models.sam3d_body.video import \
            project_keypoints_perspective

        kp = np.zeros((3, 3))
        cam = np.asarray([-1.0, 0.0, 0.0])  # flipped scale -> s=1
        bbox = [40, 30, 120, 130]  # center (80, 80), size 100
        out = project_keypoints_perspective(kp, cam, bbox, 160, 160)
        # a point at the camera ray center projects to the bbox center
        assert np.allclose(out[:, 0], 80.0, atol=1.0)
        assert np.allclose(out[:, 1], 80.0, atol=1.0)

    def test_process_frames_pipeline(self):
        from mlx_vlm_tpu.models.sam3d_body.estimator import SAM3DPredictor
        from mlx_vlm_tpu.models.sam3d_body.video import process_frames

        model = Model(TINY)
        params = init_sam3d_params(TINY, jax.random.PRNGKey(0))
        pred = SAM3DPredictor(model, params)
        frames = [np.zeros((96, 64, 3), np.uint8) for _ in range(2)]
        calls = []

        def detect(frame):
            calls.append(1)
            return [[8, 8, 56, 88]]

        results = list(process_frames(pred, frames, detect=detect))
        assert len(results) == 2 and len(calls) == 2
        r = results[0]
        assert r["bbox"] == [8, 8, 56, 88]
        assert r["keypoints_2d"].shape == (TINY.num_point_embeddings, 2)
        assert r["frame"].shape == (96, 64, 3)
