"""MHR parametric body model: rotations, parameter codecs, FK, skinning.

Role parity: reference mlx_vlm/models/sam3d_body/mhr_utils.py (rot6d /
euler / quaternion conversions, the 260D->133D and 54D->27D continuous-pose
codecs, MHR index tables) and mhr_body.py MHRBodyModel (parameter transform
-> blend shapes -> pose correctives -> forward kinematics -> linear blend
skinning).

TPU design — the reference pays three heavy penalties that a TPU must not:
- its FK is a 127-iteration Python loop of per-joint einsums; here it is a
  `lax.fori_loop` over full [J, ...] carry buffers (one compiled body,
  dynamic parent gather), fully inside jit;
- its scatter-adds (skinning accumulation, sparse pose correctives) round-
  trip through numpy (`np.add.at`) per call; here they are XLA-native
  `.at[].add()` scatters batched over batch and xyz at once;
- its 260D->133D pose codec loops 23+58+6 times building Python lists; here
  the 6D chunks reshape to [B, 23, 6] for ONE batched rot6d->euler and the
  whole 133-vector assembles with a single precomputed gather permutation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "rot6d_to_rotmat", "rotmat_to_euler_zyx", "euler_xyz_to_rotmat",
    "quat_to_rotmat", "rotmat_to_quat", "batch_xyz_from_6d",
    "cont_to_body_params", "cont_to_hand_params", "mhr_forward",
    "MHR_PARAM_HAND_IDXS", "HAND_DOFS_IN_ORDER",
]

# --- MHR index tables (reference mhr_utils.py — model-definition constants)
ALL_PARAM_3DOF_ROT_IDXS = (
    (0, 2, 4), (6, 8, 10), (12, 13, 14), (15, 16, 17), (18, 19, 20),
    (21, 22, 23), (24, 25, 26), (27, 28, 29), (34, 35, 36), (37, 38, 39),
    (44, 45, 46), (53, 54, 55), (64, 65, 66), (85, 69, 73), (86, 70, 79),
    (87, 71, 82), (88, 72, 76), (91, 92, 93), (112, 96, 100), (113, 97, 106),
    (114, 98, 109), (115, 99, 103), (130, 131, 132),
)
ALL_PARAM_1DOF_ROT_IDXS = (
    1, 3, 5, 7, 9, 11, 30, 31, 32, 33, 40, 41, 42, 43, 47, 48, 49, 50, 51,
    52, 56, 57, 58, 59, 60, 61, 62, 63, 67, 68, 74, 75, 77, 78, 80, 81, 83,
    84, 89, 90, 94, 95, 101, 102, 104, 105, 107, 108, 110, 111, 116, 117,
    118, 119, 120, 121, 122, 123,
)
ALL_PARAM_1DOF_TRANS_IDXS = (124, 125, 126, 127, 128, 129)
MHR_PARAM_HAND_IDXS = tuple(range(62, 116))
HAND_DOFS_IN_ORDER = (3, 1, 1, 3, 1, 1, 3, 1, 1, 3, 1, 1, 2, 3, 1, 1)


# ------------------------------------------------------------- rotations
def _cross(a, b):
    return jnp.stack([
        a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
        a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
        a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
    ], axis=-1)


def rot6d_to_rotmat(x: jax.Array) -> jax.Array:
    """[..., 6] (first two rotmat columns) -> [..., 3, 3]."""
    x1 = x[..., :3]
    x2 = x[..., 3:]
    x1 = x1 / (jnp.linalg.norm(x1, axis=-1, keepdims=True) + 1e-8)
    z = _cross(x1, x2)
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
    y = _cross(z, x1)
    return jnp.stack([x1, y, z], axis=-1)


def rotmat_to_euler_zyx(R: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 3] ZYX euler (reference rotmat_to_euler_ZYX)."""
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = (sy < 1e-6).astype(R.dtype)
    x = (jnp.arctan2(R[..., 2, 1], R[..., 2, 2]) * (1 - singular)
         + jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]) * singular)
    y = jnp.arctan2(-R[..., 2, 0], sy)
    z = jnp.arctan2(R[..., 1, 0], R[..., 0, 0]) * (1 - singular)
    return jnp.stack([z, y, x], axis=-1)


def batch_xyz_from_6d(poses: jax.Array) -> jax.Array:
    """[..., 6] -> [..., 3] XYZ euler (reference batch_xyz_from_6d)."""
    x_raw = poses[..., :3]
    y_raw = poses[..., 3:]
    x = x_raw / (jnp.linalg.norm(x_raw, axis=-1, keepdims=True) + 1e-8)
    z = _cross(x, y_raw)
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
    y = _cross(z, x)
    m = jnp.stack([x, y, z], axis=-1)
    sy = jnp.sqrt(m[..., 0, 0] ** 2 + m[..., 1, 0] ** 2)
    singular = (sy < 1e-6).astype(m.dtype)
    ex = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    ey = jnp.arctan2(-m[..., 2, 0], sy)
    ez = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    exs = jnp.arctan2(-m[..., 1, 2], m[..., 1, 1])
    return jnp.stack([ex * (1 - singular) + exs * singular, ey,
                      ez * (1 - singular)], axis=-1)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """[..., 4] (x, y, z, w) -> [..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (y2 + z2), 2 * (xy - wz), 2 * (xz + wy)], -1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (x2 + z2), 2 * (yz - wx)], -1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (x2 + y2)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def euler_xyz_to_rotmat(a: jax.Array) -> jax.Array:
    """[..., 3] -> R = Rz @ Ry @ Rx."""
    cx, sx = jnp.cos(a[..., 0]), jnp.sin(a[..., 0])
    cy, sy = jnp.cos(a[..., 1]), jnp.sin(a[..., 1])
    cz, sz = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    row0 = jnp.stack([cz * cy, cz * sy * sx - sz * cx,
                      cz * sy * cx + sz * sx], -1)
    row1 = jnp.stack([sz * cy, sz * sy * sx + cz * cx,
                      sz * sy * cx - cz * sx], -1)
    row2 = jnp.stack([-sy, cy * sx, cy * cx], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 4] via Shepperd's 4-branch method."""
    R00, R01, R02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    R10, R11, R12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    R20, R21, R22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = R00 + R11 + R22

    s0 = jnp.sqrt(jnp.maximum(trace + 1.0, 1e-10)) * 2.0
    q0 = jnp.stack([(R21 - R12) / (s0 + 1e-10), (R02 - R20) / (s0 + 1e-10),
                    (R10 - R01) / (s0 + 1e-10), 0.25 * s0], -1)
    s1 = jnp.sqrt(jnp.maximum(1.0 + R00 - R11 - R22, 1e-10)) * 2.0
    q1 = jnp.stack([0.25 * s1, (R01 + R10) / (s1 + 1e-10),
                    (R02 + R20) / (s1 + 1e-10), (R21 - R12) / (s1 + 1e-10)],
                   -1)
    s2 = jnp.sqrt(jnp.maximum(1.0 - R00 + R11 - R22, 1e-10)) * 2.0
    q2 = jnp.stack([(R01 + R10) / (s2 + 1e-10), 0.25 * s2,
                    (R12 + R21) / (s2 + 1e-10), (R02 - R20) / (s2 + 1e-10)],
                   -1)
    s3 = jnp.sqrt(jnp.maximum(1.0 - R00 - R11 + R22, 1e-10)) * 2.0
    q3 = jnp.stack([(R02 + R20) / (s3 + 1e-10), (R12 + R21) / (s3 + 1e-10),
                    0.25 * s3, (R10 - R01) / (s3 + 1e-10)], -1)

    best = jnp.argmax(jnp.stack([trace, R00, R11, R22], -1), axis=-1)
    out = q0
    out = jnp.where((best == 1)[..., None], q1, out)
    out = jnp.where((best == 2)[..., None], q2, out)
    out = jnp.where((best == 3)[..., None], q3, out)
    return out


# --------------------------------------------------------- pose codecs
@functools.lru_cache(maxsize=1)
def _body_codec_permutation() -> np.ndarray:
    """argsort of the concatenated destination indices — the ONE gather
    that replaces the reference's 87-iteration scatter loop."""
    dests = []
    for ix, iy, iz in ALL_PARAM_3DOF_ROT_IDXS:
        dests += [ix, iy, iz]
    dests += list(ALL_PARAM_1DOF_ROT_IDXS)
    dests += list(ALL_PARAM_1DOF_TRANS_IDXS)
    return np.argsort(np.asarray(dests))


def cont_to_body_params(cont: jax.Array) -> jax.Array:
    """260D continuous body pose -> 133D euler angles (reference
    compact_cont_to_model_params_body), fully vectorized."""
    B = cont.shape[0]
    n3 = len(ALL_PARAM_3DOF_ROT_IDXS)  # 23
    n1 = len(ALL_PARAM_1DOF_ROT_IDXS)  # 58
    six = cont[:, : n3 * 6].reshape(B, n3, 6)
    euler = batch_xyz_from_6d(six).reshape(B, n3 * 3)  # [B, 69]
    sc = cont[:, n3 * 6: n3 * 6 + n1 * 2].reshape(B, n1, 2)
    angles = jnp.arctan2(sc[..., 0], sc[..., 1])  # [B, 58]
    trans = cont[:, n3 * 6 + n1 * 2:]  # [B, 6]
    values = jnp.concatenate([euler, angles, trans], axis=1)  # [B, 133]
    return values[:, jnp.asarray(_body_codec_permutation())]


@functools.lru_cache(maxsize=1)
def _hand_codec_slices():
    """(kind, offset) per joint group for the 54D hand codec."""
    out = []
    off = 0
    for dof in HAND_DOFS_IN_ORDER:
        out.append((dof, off))
        off += {3: 6, 1: 2, 2: 4}[dof]
    return tuple(out)


def cont_to_hand_params(cont: jax.Array) -> jax.Array:
    """54D continuous hand pose -> 27D euler angles (reference
    compact_cont_to_model_params_hand)."""
    parts = []
    for dof, off in _hand_codec_slices():
        if dof == 3:
            parts.append(batch_xyz_from_6d(cont[:, off:off + 6]))
        elif dof == 1:
            sc = cont[:, off:off + 2]
            parts.append(jnp.arctan2(sc[:, :1], sc[:, 1:2]))
        else:  # two packed 1-DOF joints
            sc = cont[:, off:off + 4].reshape(-1, 2, 2)
            parts.append(jnp.arctan2(sc[..., 0], sc[..., 1]))
    return jnp.concatenate(parts, axis=1)


# ----------------------------------------------------------- body model
def _parameter_transform(p: dict, model_params: jax.Array) -> jax.Array:
    """[B, 204] -> [B, J*7] joint DOFs via the PT matrix (padded input)."""
    pt = p["parameter_transform"].astype(jnp.float32)  # [J*7, P]
    B = model_params.shape[0]
    pad = pt.shape[1] - model_params.shape[1]
    padded = jnp.concatenate(
        [model_params, jnp.zeros((B, pad), model_params.dtype)], axis=1)
    return padded @ pt.T


def _forward_kinematics(p: dict, joint_dofs: jax.Array, num_joints: int):
    """[B, J*7] -> (skel_state [B,J,8], pos, rot, scale) with a fori_loop
    over full-array carries (reference runs a Python loop of einsums)."""
    B = joint_dofs.shape[0]
    J = num_joints
    jd = joint_dofs.reshape(B, J, 7)
    local_rot = euler_xyz_to_rotmat(jd[..., 3:6])  # [B, J, 3, 3]
    prerot = quat_to_rotmat(p["joint_prerotations"].astype(jnp.float32))
    local_rot = jnp.einsum("jpq,bjqr->bjpr", prerot, local_rot)
    trans = p["joint_translation_offsets"].astype(jnp.float32)[None] \
        + jd[..., :3]
    scale = jnp.exp(jd[..., 6:7] * 0.6931471824645996)  # 2^dof
    parents = p["joint_parents"].astype(jnp.int32)  # [-1 for root]

    def body(j, carry):
        gp, gr, gs = carry
        par = parents[j]
        is_root = par < 0
        pidx = jnp.maximum(par, 0)
        pr = gr[:, pidx]
        pp = gp[:, pidx]
        ps = gs[:, pidx]
        lt = trans[:, j]
        lr = local_rot[:, j]
        ls = scale[:, j]
        cp = jnp.where(is_root, lt, pp + ps * jnp.einsum("bij,bj->bi", pr, lt))
        cr = jnp.where(is_root, lr, jnp.einsum("bij,bjk->bik", pr, lr))
        cs = jnp.where(is_root, ls, ps * ls)
        return (gp.at[:, j].set(cp), gr.at[:, j].set(cr), gs.at[:, j].set(cs))

    init = (jnp.zeros((B, J, 3)), jnp.zeros((B, J, 3, 3)),
            jnp.ones((B, J, 1)))
    gp, gr, gs = jax.lax.fori_loop(0, J, body, init)
    quat = rotmat_to_quat(gr)
    skel_state = jnp.concatenate([gp, quat, gs], axis=-1)
    return skel_state, gp, gr, gs


def _blend_shapes(p: dict, shape_params, expr_params):
    verts = p["base_shape"].astype(jnp.float32)[None] + jnp.einsum(
        "bs,svd->bvd", shape_params, p["shape_vectors"].astype(jnp.float32))
    if expr_params is not None and "face_shape_vectors" in p:
        verts = verts + jnp.einsum(
            "bf,fvd->bvd", expr_params,
            p["face_shape_vectors"].astype(jnp.float32))
    return verts


def _pose_features(joint_dofs: jax.Array, num_joints: int) -> jax.Array:
    """[B, J*7] -> [B, (J-2)*6] identity-subtracted 6D features."""
    B = joint_dofs.shape[0]
    euler = joint_dofs.reshape(B, num_joints, 7)[:, 2:, 3:6]
    cx, sx = jnp.cos(euler[..., 0]), jnp.sin(euler[..., 0])
    cy, sy = jnp.cos(euler[..., 1]), jnp.sin(euler[..., 1])
    cz, sz = jnp.cos(euler[..., 2]), jnp.sin(euler[..., 2])
    feat = jnp.stack([cy * cz, cy * sz, -sy,
                      -cx * sz + sx * sy * cz, cx * cz + sx * sy * sz,
                      sx * cy], axis=-1)
    feat = feat - jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0])
    return feat.reshape(B, -1)


def _pose_correctives(p: dict, joint_dofs: jax.Array, num_joints: int,
                      num_verts: int) -> jax.Array:
    """sparse layer -> ReLU -> dense; the sparse matmul is one XLA
    segment-sum scatter (reference loops numpy add.at per batch row)."""
    feats = _pose_features(joint_dofs, num_joints)  # [B, 750]
    out_idx = p["pc_sparse_indices"][0].astype(jnp.int32)
    in_idx = p["pc_sparse_indices"][1].astype(jnp.int32)
    w = p["pc_sparse_weight"].astype(jnp.float32)
    B = feats.shape[0]
    dense_w = p["pc_linear_weight"].astype(jnp.float32)  # [V*3, hidden]
    hidden = dense_w.shape[1]
    weighted = feats[:, in_idx] * w[None]  # [B, K]
    sparse = jnp.zeros((B, hidden)).at[:, out_idx].add(weighted)
    out = jax.nn.relu(sparse) @ dense_w.T
    return out.reshape(B, num_verts, 3)


def _linear_blend_skinning(p: dict, rest_verts, gp, gr, gs,
                           num_verts: int) -> jax.Array:
    """Weighted joint transforms accumulated with one batched scatter-add."""
    ibp = p["inverse_bind_pose"].astype(jnp.float32)  # [J, 8]
    ibp_rot = quat_to_rotmat(ibp[:, 3:7])
    combined_rot = jnp.einsum("bjik,jkl->bjil", gr, ibp_rot)
    combined_trans = gp + jnp.einsum("bjik,jk->bji", gr, ibp[:, :3]) * gs
    combined_scale = gs * ibp[:, 7:8][None]

    si = p["skin_indices"].astype(jnp.int32)
    sw = p["skin_weights"].astype(jnp.float32)
    vi = p["vert_indices"].astype(jnp.int32)
    v = rest_verts[:, vi]  # [B, N, 3]
    cr = combined_rot[:, si]
    ct = combined_trans[:, si]
    cs = combined_scale[:, si]
    moved = (cs * jnp.einsum("bnij,bnj->bni", cr, v) + ct) * sw[None, :, None]
    B = rest_verts.shape[0]
    return jnp.zeros((B, num_verts, 3)).at[:, vi].add(moved)


def mhr_forward(params: dict, shape_params: jax.Array,
                model_params: jax.Array,
                expr_params: Optional[jax.Array] = None,
                num_joints: int = 127, num_verts: int = 18439):
    """(shape [B,45], model [B,204], expr [B,72]?) ->
    (skinned_verts [B,V,3], skel_state [B,J,8]) — reference
    MHRBodyModel.__call__ (parameter limits skipped at inference, like the
    reference JIT model)."""
    joint_dofs = _parameter_transform(params, model_params)
    verts = _blend_shapes(params, shape_params, expr_params)
    verts = verts + _pose_correctives(params, joint_dofs, num_joints,
                                      num_verts)
    skel_state, gp, gr, gs = _forward_kinematics(params, joint_dofs,
                                                 num_joints)
    skinned = _linear_blend_skinning(params, verts, gp, gr, gs, num_verts)
    return skinned, skel_state
