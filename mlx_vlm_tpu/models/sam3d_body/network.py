"""SAM 3D Body network: DINOv3 backbone, promptable decoder, MHR head.

Role parity: reference mlx_vlm/models/sam3d_body/backbone.py (DINOv3-H+ ViT
with masked-K-bias attention, LayerScale, SwiGLU, split-half RoPE over
normalized grid coords), rope.py, transformer.py + decoder.py
(PromptableDecoder: 6 LaPE-normed self+cross+FFN layers with per-layer
intermediate pose predictions and keypoint-token refeeding), layers.py,
prompt_encoder.py (Gaussian Fourier PE, per-keypoint type embeddings),
mhr_head.py MHRHead + model.py SAM3DBody (ray conditioning, token assembly,
perspective projection, grid-sampled keypoint feature updates, CameraHead).

TPU design:
- the 32 backbone blocks are weight-stacked under ONE `lax.scan`; RoPE
  tables are computed in-graph from the loaded `periods` buffer;
- the whole predict step — backbone, ray conditioning, 6 decoder layers
  with their per-layer MHR forward-kinematics/skinning refinements, heads —
  is a single jit program per image shape: bbox / intrinsics enter as
  traced arrays so per-frame video calls never recompile;
- bilinear grid-sampling is a batched gather (no Python loop over batch);
  the per-label prompt-embedding loop becomes one [70, D] table gather.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear
from .mhr import (MHR_PARAM_HAND_IDXS, cont_to_body_params,
                  cont_to_hand_params, mhr_forward, rot6d_to_rotmat,
                  rotmat_to_euler_zyx)

__all__ = ["dinov3_backbone", "prompt_dense_pe", "sam3d_forward",
           "mhr_head_forward", "DINOV3_STACK_PATTERNS"]

DINOV3_STACK_PATTERNS = ("backbone.blocks", "decoder.layers")


def _ln(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """fp32 LayerNorm (reference LayerNorm32)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xf * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


# --------------------------------------------------------------- backbone
def _dinov3_rope(periods: jax.Array, H: int, W: int):
    """(sin, cos) [H*W, head_dim] from normalized grid coords
    (reference rope.DINOv3RoPE — split-half convention, loaded periods)."""
    ch = (jnp.arange(0.5, H) / H) * 2 - 1
    cw = (jnp.arange(0.5, W) / W) * 2 - 1
    gh, gw = jnp.meshgrid(ch, cw, indexing="ij")
    coords = jnp.stack([gh, gw], axis=-1).reshape(-1, 2)
    angles = 2 * math.pi * coords[:, :, None] / periods.astype(jnp.float32)
    angles = angles.reshape(angles.shape[0], -1)
    angles = jnp.concatenate([angles, angles], axis=-1)
    return jnp.sin(angles), jnp.cos(angles)


def _rope_half(x):
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)


def dinov3_backbone(p: dict, cfg, image: jax.Array) -> jax.Array:
    """[B, H, W, 3] -> [B, H/ps, W/ps, embed_dim] patch features
    (reference DINOv3Backbone.__call__)."""
    ps = cfg.patch_size
    D, nh, hd = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    B, H, W, _ = image.shape
    Hp, Wp = H // ps, W // ps

    pe = p["patch_embed"]["projection"]
    x = jax.lax.conv_general_dilated(
        image, pe["weight"].astype(image.dtype), (ps, ps), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + pe["bias"].astype(x.dtype)
    x = x.reshape(B, Hp * Wp, D)
    cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype), (B, 1, D))
    stor = jnp.broadcast_to(p["storage_tokens"].astype(x.dtype),
                            (B, cfg.num_storage_tokens, D))
    x = jnp.concatenate([cls, stor, x], axis=1)
    prefix = 1 + cfg.num_storage_tokens
    N = x.shape[1]

    sin, cos = _dinov3_rope(p["rope_embed"]["periods"], Hp, Wp)
    sin = sin[None, None]
    cos = cos[None, None]

    def block(h, lp):
        a = lp["attention"]
        hn = _ln(lp["norm1"], h)
        q = linear(a["q_proj"], hn).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        k = linear(a["k_proj"], hn).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        v = linear(a["v_proj"], hn).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        qp = q[:, :, prefix:].astype(jnp.float32)
        kp = k[:, :, prefix:].astype(jnp.float32)
        q = jnp.concatenate(
            [q[:, :, :prefix],
             (qp * cos + _rope_half(qp) * sin).astype(q.dtype)], axis=2)
        k = jnp.concatenate(
            [k[:, :, :prefix],
             (kp * cos + _rope_half(kp) * sin).astype(k.dtype)], axis=2)
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (hd ** -0.5)
        o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1),
                       v.astype(jnp.float32)).astype(h.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
        o = linear(a["o_proj"], o)
        h = h + o * lp["ls1"]["gamma"].astype(h.dtype)
        m = lp["mlp"]
        hn = _ln(lp["norm2"], h)
        ff = linear(m["w3"], jax.nn.silu(linear(m["w1"], hn))
                    * linear(m["w2"], hn))
        return h + ff * lp["ls2"]["gamma"].astype(h.dtype), None

    x, _ = jax.lax.scan(block, x, p["blocks"])
    x = _ln(p["norm"], x)
    return x[:, prefix:].reshape(B, Hp, Wp, D)


# ---------------------------------------------------------- prompt encoder
def _gaussian_pe(matrix: jax.Array, coords: jax.Array) -> jax.Array:
    """[..., 2] in [0,1] -> [..., 2*F] random Fourier features
    (reference PositionalEncodingGaussian)."""
    c = (coords * 2 - 1) @ (matrix.astype(jnp.float32) * 2 * math.pi)
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def prompt_dense_pe(p: dict, h: int, w: int) -> jax.Array:
    """[1, h, w, embed_dim] grid PE (reference PromptEncoder.get_dense_pe)."""
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    coords = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)
    pe = _gaussian_pe(p["pe_layer"]["positional_encoding_gaussian_matrix"],
                      coords.reshape(1, h * w, 2))
    return pe.reshape(1, h, w, -1)


def encode_points(p: dict, points: jax.Array, labels: jax.Array):
    """(points [B,N,2] in [0,1], labels [B,N] in {-1..69}) -> (emb, pe).

    One [70, D] table gather replaces the reference's 70-iteration
    per-label masking loop (encode_points)."""
    pe = _gaussian_pe(p["pe_layer"]["positional_encoding_gaussian_matrix"],
                      points)
    table = p["point_embeddings"]["weight"].astype(jnp.float32)  # [70, D]
    emb = table[jnp.clip(labels, 0, table.shape[0] - 1)]
    invalid = (labels == -1)[..., None]
    emb = jnp.where(invalid,
                    p["invalid_point_embed"]["weight"][0].astype(jnp.float32),
                    emb)
    pe = pe * (1 - invalid.astype(pe.dtype))
    return emb, pe


# ------------------------------------------------------------ decoder bits
def _decoder_attn(p: dict, q, k, v, num_heads: int):
    B, N = q.shape[:2]
    qh = linear(p["q_proj"], q).reshape(B, N, num_heads, -1)
    kh = linear(p["k_proj"], k).reshape(B, k.shape[1], num_heads, -1)
    vh = linear(p["v_proj"], v).reshape(B, v.shape[1], num_heads, -1)
    hd = qh.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                   kh.astype(jnp.float32)) * (hd ** -0.5)
    o = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, axis=-1),
                   vh.astype(jnp.float32)).astype(q.dtype)
    return linear(p["proj"], o.reshape(B, N, -1))


def _decoder_ffn(p: dict, x):
    """weight layout ffn.layers.0.0 / ffn.layers.1 (reference DecoderFFN)."""
    h = jax.nn.relu(linear(p["layers"]["0"]["0"], x))
    return linear(p["layers"]["1"], h)


def _decoder_layer(lp: dict, x, context, x_pe, context_pe, num_heads: int,
                   skip_first_pe: bool):
    """LaPE self+cross+FFN layer (reference TransformerDecoderLayer)."""
    x_pe_n = _ln(lp["ln_pe_1"], x_pe, 1e-6)
    ctx_pe_n = _ln(lp["ln_pe_2"], context_pe, 1e-6)
    ln1 = _ln(lp["ln1"], x, 1e-6)
    if skip_first_pe:
        q = k = v = ln1
    else:
        q = k = ln1 + x_pe_n
        v = ln1
    x = x + _decoder_attn(lp["self_attn"], q, k, v, num_heads)
    q = _ln(lp["ln2_1"], x, 1e-6) + x_pe_n
    ctx_n = _ln(lp["ln2_2"], context, 1e-6)
    x = x + _decoder_attn(lp["cross_attn"], q, ctx_n + ctx_pe_n, ctx_n,
                          num_heads)
    x = x + _decoder_ffn(lp["ffn"], _ln(lp["ln3"], x, 1e-6))
    return x


# ------------------------------------------------------------------ heads
def mhr_head_forward(p: dict, cfg, x: jax.Array,
                     init_estimate: Optional[jax.Array] = None) -> dict:
    """pose token [B, 1024] -> MHR outputs (reference MHRHead.__call__)."""
    pred = _decoder_ffn(p["proj"], x)
    if init_estimate is not None:
        pred = pred + init_estimate
    B = pred.shape[0]

    g6 = pred[:, :6]
    pose_cont = pred[:, 6:266]
    shape = pred[:, 266:311]
    scale_c = pred[:, 311:339]
    hand = pred[:, 339:447]
    face = pred[:, 447:519] * 0

    g_euler = rotmat_to_euler_zyx(rot6d_to_rotmat(g6))
    pose_euler = cont_to_body_params(pose_cont)  # [B, 133]
    # hand params come from the PCA head; zero them in the body vector,
    # zero the jaw (last 3)
    mask = np.ones((133,), np.float32)
    mask[list(MHR_PARAM_HAND_IDXS)] = 0.0
    mask[-3:] = 0.0
    pose_euler = pose_euler * jnp.asarray(mask)[None]
    body = pose_euler[:, :130]
    scales = (p["scale_mean"].astype(jnp.float32)[None]
              + scale_c @ p["scale_comps"].astype(jnp.float32))

    full_pose = jnp.concatenate(
        [jnp.zeros((B, 3)), g_euler, body], axis=1)  # [B, 136]

    # decode hand PCA and scatter into the pose vector
    hp_mean = p["hand_pose_mean"].astype(jnp.float32)[None]
    hp_comps = p["hand_pose_comps"].astype(jnp.float32)
    left = cont_to_hand_params(hp_mean + hand[:, :54] @ hp_comps)
    right = cont_to_hand_params(hp_mean + hand[:, 54:] @ hp_comps)
    full_pose = full_pose.at[
        :, p["hand_joint_idxs_left"].astype(jnp.int32)].set(left)
    full_pose = full_pose.at[
        :, p["hand_joint_idxs_right"].astype(jnp.int32)].set(right)

    model_params = jnp.concatenate([full_pose, scales], axis=1)  # [B, 204]
    verts, skel_state = mhr_forward(
        p["body_model"], shape, model_params, face,
        num_joints=cfg.num_joints, num_verts=cfg.num_vertices)

    joints = skel_state[..., :3] / 100.0  # cm -> m
    verts = verts / 100.0
    vj = jnp.concatenate([verts, joints], axis=1)
    kp = jnp.einsum("kv,bvd->bkd", p["keypoint_mapping"].astype(jnp.float32),
                    vj)[:, :cfg.num_point_embeddings]
    flip = jnp.asarray([1.0, -1.0, -1.0])
    return {
        "pred_vertices": verts * flip,
        "pred_keypoints_3d": kp * flip,
        "pred_joint_coords": joints * flip,
        "pred_model_params": model_params,
        "pred_shape": shape,
    }


def _camera_head(p: dict, x: jax.Array, init: jax.Array) -> jax.Array:
    return _decoder_ffn(p["proj"], x) + init


# ------------------------------------------------------------- geometry
def _fourier_encode(pos: jax.Array, num_bands: int = 16,
                    max_resolution: int = 64) -> jax.Array:
    """[..., 3] -> [..., 3 + 3*bands*2] (reference model.fourier_encode)."""
    bands = jnp.linspace(1.0, max_resolution / 2, num_bands)
    feats = (pos[..., None] * bands).reshape(*pos.shape[:-1], 3 * num_bands)
    return jnp.concatenate(
        [pos, jnp.sin(math.pi * feats), jnp.cos(math.pi * feats)], axis=-1)


def _grid_sample(features: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sample [B, H, W, C] at [B, N, 2] in [-1, 1] -> [B, N, C];
    batched gathers, no per-row Python loop (reference grid_sample_2d)."""
    B, H, W, C = features.shape
    x = (coords[..., 0] + 1) * (W - 1) / 2
    y = (coords[..., 1] + 1) * (H - 1) / 2
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1

    def at(yy, xx):
        yi = jnp.clip(yy.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xx.astype(jnp.int32), 0, W - 1)
        flat = features.reshape(B, H * W, C)
        return jnp.take_along_axis(
            flat, (yi * W + xi)[..., None], axis=1)

    wa = ((x1 - x) * (y1 - y))[..., None]
    wb = ((x - x0) * (y1 - y))[..., None]
    wc = ((x1 - x) * (y - y0))[..., None]
    wd = ((x - x0) * (y - y0))[..., None]
    return (wa * at(y0, x0) + wb * at(y0, x1)
            + wc * at(y1, x0) + wd * at(y1, x1))


def _ray_map(cfg, bbox: jax.Array, cam_int: jax.Array) -> jax.Array:
    """[1, H, W, 2] camera rays over the crop (reference compute_ray_map)."""
    H, W = cfg.image_size
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    sx = (bbox[2] - bbox[0]) / W
    sy = (bbox[3] - bbox[1]) / H
    ox = gx * sx + bbox[0]
    oy = gy * sy + bbox[1]
    rx = (ox - cam_int[0, 2]) / cam_int[0, 0]
    ry = (oy - cam_int[1, 2]) / cam_int[1, 1]
    return jnp.stack([rx, ry], axis=-1)[None]


def _apply_ray_conditioning(p: dict, cfg, feats: jax.Array,
                            rays: jax.Array) -> jax.Array:
    """area-pool rays to patches, Fourier-encode, concat, 1x1 conv + LN
    (reference apply_ray_conditioning)."""
    B, Hp, Wp, C = feats.shape
    ps = cfg.patch_size
    down = rays.reshape(rays.shape[0], Hp, ps, Wp, ps, 2).mean(axis=(2, 4))
    rays3 = jnp.concatenate(
        [down, jnp.ones(down.shape[:-1] + (1,), down.dtype)], axis=-1)
    enc = _fourier_encode(rays3.reshape(rays3.shape[0], -1, 3))
    enc = enc.reshape(rays3.shape[0], Hp, Wp, -1)
    enc = jnp.broadcast_to(enc, (B, Hp, Wp, enc.shape[-1]))
    combined = jnp.concatenate([feats, enc.astype(feats.dtype)], axis=-1)
    rc = p["ray_cond_emb"]
    out = jax.lax.conv_general_dilated(
        combined, rc["conv"]["weight"].astype(combined.dtype), (1, 1),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out + rc["conv"]["bias"].astype(out.dtype)
    return _ln(rc["norm"], out, 1e-5)


def _perspective_projection(cfg, kp3d, pred_cam, bbox, img_size, focal):
    """3D keypoints -> [-1, 1] crop coords (reference
    _perspective_projection); bbox / img_size / focal are traced arrays."""
    s = -pred_cam[:, 0:1]
    tx = pred_cam[:, 1:2]
    ty = -pred_cam[:, 2:3]
    img_h, img_w = img_size[0], img_size[1]
    bcx = (bbox[0] + bbox[2]) / 2
    bcy = (bbox[1] + bbox[3]) / 2
    bsize = jnp.maximum(bbox[2] - bbox[0], bbox[3] - bbox[1])
    bs = bsize * s + 1e-8
    tz = 2 * focal / bs
    cam_t = jnp.concatenate(
        [tx + 2 * (bcx - img_w / 2) / bs, ty + 2 * (bcy - img_h / 2) / bs,
         tz], axis=1)
    j3d = kp3d + cam_t[:, None, :]
    j3d = j3d / (j3d[..., 2:3] + 1e-8)
    kx = focal * j3d[..., 0] + img_w / 2
    ky = focal * j3d[..., 1] + img_h / 2
    crop = bsize * 1.2
    return jnp.stack([(kx - bcx) / (crop / 2), (ky - bcy) / (crop / 2)],
                     axis=-1)


# ------------------------------------------------------------- full model
def sam3d_forward(params: dict, cfg, image: jax.Array,
                  cliff_condition: Optional[jax.Array] = None,
                  bbox: Optional[jax.Array] = None,
                  img_size: Optional[jax.Array] = None,
                  cam_int: Optional[jax.Array] = None):
    """(image [B,H,W,3] normalized, cliff [B,3], bbox [4], img_size [2],
    cam_int [3,3]) -> (body_output dict, pred_cam [B,3]) — reference
    SAM3DBody.__call__ with per-layer keypoint refeeding."""
    B = image.shape[0]
    Dd = cfg.decoder_dim
    n_kp = cfg.num_point_embeddings

    feats = dinov3_backbone(params["backbone"], cfg, image)
    use_rays = cam_int is not None and bbox is not None
    if use_rays:
        rays = _ray_map(cfg, bbox, cam_int)
        feats = _apply_ray_conditioning(params, cfg, feats, rays)
    Hp, Wp = feats.shape[1:3]

    init_pose = jnp.broadcast_to(params["init_pose"].astype(jnp.float32),
                                 (B, cfg.pose_output_dim))
    init_cam = jnp.broadcast_to(params["init_camera"].astype(jnp.float32),
                                (B, cfg.camera_output_dim))
    init_estimate = jnp.concatenate([init_pose, init_cam], axis=1)
    if cliff_condition is None:
        cliff_condition = jnp.zeros((B, 3))
    init_token = linear(params["init_to_token_mhr"], jnp.concatenate(
        [cliff_condition, init_estimate], axis=1)[:, None])
    prev_token = linear(params["prev_to_token_mhr"],
                        init_estimate[:, None])
    dummy_emb, _ = encode_points(
        params["prompt_encoder"], jnp.zeros((B, 1, 2)),
        jnp.full((B, 1), -1, jnp.int32))
    prompt_token = linear(params["prompt_to_token"],
                          dummy_emb.astype(init_token.dtype))
    hand_tokens = jnp.broadcast_to(
        params["hand_box_embedding"].astype(init_token.dtype)[None],
        (B, 2, Dd))
    kp_tokens = jnp.broadcast_to(
        params["keypoint_embedding"].astype(init_token.dtype)[None],
        (B, n_kp, Dd))
    kp3d_tokens = jnp.broadcast_to(
        params["keypoint3d_embedding"].astype(init_token.dtype)[None],
        (B, n_kp, Dd))
    tokens = jnp.concatenate(
        [init_token, prev_token, prompt_token, hand_tokens, kp_tokens,
         kp3d_tokens], axis=1)  # [B, 145, Dd]

    KP2D = 5
    KP3D = 5 + n_kp
    token_pe = jnp.concatenate(
        [jnp.zeros((B, 1, Dd)), prev_token, prompt_token,
         jnp.zeros((B, 2, Dd)), jnp.zeros((B, n_kp, Dd)),
         jnp.zeros((B, n_kp, Dd))], axis=1).astype(tokens.dtype)

    image_pe = prompt_dense_pe(params["prompt_encoder"], Hp, Wp)
    context = feats.reshape(B, Hp * Wp, -1)
    context_pe = jnp.broadcast_to(
        image_pe.reshape(1, Hp * Wp, -1),
        (B, Hp * Wp, image_pe.shape[-1])).astype(context.dtype)

    def mlp2(p, x):
        # weight layout layers.0.0 / layers.1 (reference MLP2Layer)
        return linear(p["layers"]["1"],
                      jax.nn.relu(linear(p["layers"]["0"]["0"], x)))

    dec = params["decoder"]
    focal = (cam_int[0, 0] if cam_int is not None
             else jnp.sqrt(img_size[0] ** 2 + img_size[1] ** 2)
             if img_size is not None else None)
    depth = int(np.asarray(
        dec["layers"]["ln1"]["weight"].shape[0]))
    final = None
    for i in range(depth):
        lp = jax.tree_util.tree_map(lambda a: a[i], dec["layers"])
        tokens = _decoder_layer(lp, tokens, context, token_pe, context_pe,
                                cfg.decoder_heads, skip_first_pe=(i == 0))
        normed = _ln(dec["norm_final"], tokens, 1e-6)
        pose_token = normed[:, 0].astype(jnp.float32)
        body_output = mhr_head_forward(params["head_pose"], cfg, pose_token,
                                       init_estimate=init_pose)
        pred_cam = _camera_head(params["head_camera"], pose_token, init_cam)
        final = (body_output, pred_cam)
        if i == depth - 1:
            break

        kp3d = body_output["pred_keypoints_3d"]
        if bbox is not None and img_size is not None:
            kp2d = _perspective_projection(cfg, kp3d, pred_cam, bbox,
                                           img_size, focal)
            new_pe = mlp2(params["keypoint_posemb_linear"],
                          kp2d.astype(tokens.dtype))
            sampled = _grid_sample(feats, kp2d)
            proj = linear(params["keypoint_feat_linear"],
                          sampled.astype(tokens.dtype))
            tokens = tokens.at[:, KP2D:KP3D].add(proj)
            token_pe = jnp.concatenate(
                [token_pe[:, :KP2D], new_pe, token_pe[:, KP3D:]], axis=1)
        pelvis = (kp3d[:, 9:10] + kp3d[:, 10:11]) / 2
        new_pe3 = mlp2(params["keypoint3d_posemb_linear"],
                       (kp3d - pelvis).astype(tokens.dtype))
        token_pe = jnp.concatenate(
            [token_pe[:, :KP3D], new_pe3], axis=1)

    return final
