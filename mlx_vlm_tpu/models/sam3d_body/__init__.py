"""SAM 3D Body: single-image 3D human mesh estimation.

Role parity: reference mlx_vlm/models/sam3d_body/* — config.py SAM3DConfig,
model.py SAM3DBody (DINOv3-H+ backbone + promptable decoder + MHR head),
generate.py SAM3DPredictor, estimator.py crop/normalize front-end,
batch_prep.py affine crop + CLIFF conditioning, mhr_*.py parametric body
model, convert_weights.py key remaps.

Unlike the segmentation SAM families (sam3 / sam3_1) this predicts a full
18,439-vertex mesh + 127-joint skeleton + 70 3D keypoints from one cropped
person image.  Compute lives in network.py (jit-compiled end to end, the
backbone blocks under one lax.scan) and mhr.py (FK via fori_loop, skinning
and pose correctives via XLA scatter-adds — the reference loops these in
Python/numpy).  The predictor front-end (crop, CLIFF vector, intrinsics,
OBJ export) is in estimator.py.
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .mhr import mhr_forward
from .network import (DINOV3_STACK_PATTERNS, dinov3_backbone,
                      mhr_head_forward, sam3d_forward)

__all__ = ["ModelConfig", "SAM3DConfig", "VisionConfig", "TextConfig",
           "Model", "init_sam3d_params"]


@dataclasses.dataclass
class VisionConfig:
    """DINOv3 ViT-H+ (reference config.VisionConfig)."""

    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 20
    head_dim: int = 64
    patch_size: int = 16
    image_size: Tuple[int, int] = (512, 384)
    ffn_ratio: float = 4.0
    num_storage_tokens: int = 4
    rope_periods: int = 16
    model_type: str = "dinov3"

    @classmethod
    def from_dict(cls, d):
        allowed = inspect.signature(cls).parameters
        d = {k: v for k, v in (d or {}).items() if k in allowed}
        if "image_size" in d:
            d["image_size"] = tuple(d["image_size"])
        return cls(**d)


@dataclasses.dataclass
class TextConfig:
    """SAM 3D Body has no text encoder (reference config.TextConfig)."""

    model_type: str = "none"

    @classmethod
    def from_dict(cls, d):
        return cls()


@dataclasses.dataclass
class SAM3DConfig:
    """reference config.SAM3DConfig."""

    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 20
    head_dim: int = 64
    patch_size: int = 16
    image_size: Tuple[int, int] = (512, 384)
    ffn_ratio: float = 4.0
    num_storage_tokens: int = 4
    rope_periods: int = 16

    decoder_dim: int = 1024
    decoder_depth: int = 6
    decoder_heads: int = 8
    decoder_head_dim: int = 64
    decoder_mlp_dim: int = 1024

    num_joints: int = 127
    num_vertices: int = 18439
    num_faces: int = 36874
    num_shape_comps: int = 45
    num_face_comps: int = 72

    pose_output_dim: int = 519
    camera_output_dim: int = 3
    num_point_embeddings: int = 70
    prompt_embed_dim: int = 1280

    image_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    image_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    model_type: str = "sam3d_body"
    vision_config: Optional[VisionConfig] = None
    text_config: Optional[TextConfig] = None

    @classmethod
    def from_dict(cls, params):
        params = dict(params or {})
        vision = params.pop("vision_config", {})
        params.pop("text_config", {})
        allowed = inspect.signature(cls).parameters
        d = {k: v for k, v in params.items() if k in allowed}
        for k in ("image_size", "image_mean", "image_std"):
            if k in d:
                d[k] = tuple(d[k])
        return cls(vision_config=VisionConfig.from_dict(vision),
                   text_config=TextConfig(), **d)


ModelConfig = SAM3DConfig


class Model:
    """Functional SAM 3D Body (reference model.SAM3DBody)."""

    stack_patterns: Tuple = DINOV3_STACK_PATTERNS

    def __init__(self, config: SAM3DConfig):
        self.config = config

    def __call__(self, params: dict, image: jax.Array,
                 cliff_condition=None, bbox=None, img_size=None,
                 cam_int=None):
        return sam3d_forward(params, self.config, image,
                             cliff_condition=cliff_condition, bbox=bbox,
                             img_size=img_size, cam_int=cam_int)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        """Torch checkpoint keys -> param-tree keys (reference
        model.py:_remap_raw_pytorch_keys + mhr_head.load_all_weights map).
        Conv weights transpose OIHW->HWIO; the 70 per-keypoint prompt
        embeddings stack into one [70, D] table."""
        mhr_map = {
            "character.skeleton.joint_translation_offsets":
                "joint_translation_offsets",
            "character.skeleton.joint_prerotations": "joint_prerotations",
            "character.skeleton.joint_parents": "joint_parents",
            "character.parameter_transform.parameter_transform":
                "parameter_transform",
            "character.blend_shape.base_shape": "base_shape",
            "character.blend_shape.shape_vectors": "shape_vectors",
            "character.linear_blend_skinning.inverse_bind_pose":
                "inverse_bind_pose",
            "character.linear_blend_skinning.skin_indices_flattened":
                "skin_indices",
            "character.linear_blend_skinning.skin_weights_flattened":
                "skin_weights",
            "character.linear_blend_skinning.vert_indices_flattened":
                "vert_indices",
            "face_expressions.shape_vectors": "face_shape_vectors",
            "pose_correctives.pose_dirs_predictor.0.sparse_indices":
                "pc_sparse_indices",
            "pose_correctives.pose_dirs_predictor.0.sparse_weight":
                "pc_sparse_weight",
            "pose_correctives.pose_dirs_predictor.2.weight":
                "pc_linear_weight",
        }
        out = {}
        points = {}
        for k, v in weights.items():
            v = np.asarray(v)
            if k.startswith("mhr."):
                mapped = mhr_map.get(k[len("mhr."):])
                if mapped is not None:
                    out[f"head_pose.body_model.{mapped}"] = v
                continue
            if ".point_embeddings." in k:
                idx = int(k.split(".point_embeddings.")[1].split(".")[0])
                points[idx] = v.reshape(-1)
                continue
            if v.ndim == 4 and (".conv" in k or "projection" in k
                                ) and k.endswith("weight"):
                v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            out[k] = v
        if points:
            table = np.stack([points[i] for i in sorted(points)])
            out["prompt_encoder.point_embeddings.weight"] = table
        return out


# ------------------------------------------------------------ random init
def init_sam3d_params(cfg: SAM3DConfig, key: jax.Array,
                      dtype=jnp.float32) -> dict:
    """Shape-complete random params for tests / shells."""
    ks = iter(jax.random.split(key, 256))

    def rn(*shape, scale=0.02):
        return jax.random.normal(next(ks), shape, dtype) * scale

    def lin(o, i):
        return {"weight": rn(o, i), "bias": jnp.zeros((o,), dtype)}

    def norm(c):
        return {"weight": jnp.ones((c,), dtype),
                "bias": jnp.zeros((c,), dtype)}

    def ffn(i, h, o):
        return {"layers": {"0": {"0": lin(h, i)}, "1": lin(o, h)}}

    def stack(n, fn):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                      *[fn() for _ in range(n)])

    D, hd, nh = cfg.embed_dim, cfg.head_dim, cfg.num_heads
    mh = int(D * cfg.ffn_ratio)
    Dd = cfg.decoder_dim
    de = cfg.decoder_heads * cfg.decoder_head_dim
    J, V = cfg.num_joints, cfg.num_vertices
    n_kp = cfg.num_point_embeddings
    P = cfg.prompt_embed_dim

    def vit_block():
        return {
            "norm1": norm(D), "norm2": norm(D),
            "attention": {
                "q_proj": lin(D, D),
                "k_proj": {"weight": rn(D, D)},  # masked K bias
                "v_proj": lin(D, D), "o_proj": lin(D, D)},
            "ls1": {"gamma": jnp.ones((D,), dtype)},
            "ls2": {"gamma": jnp.ones((D,), dtype)},
            "mlp": {"w1": lin(mh, D), "w2": lin(mh, D), "w3": lin(D, mh)},
        }

    def dec_attn(qd, kd, vd):
        return {"q_proj": lin(de, qd), "k_proj": lin(de, kd),
                "v_proj": lin(de, vd), "proj": lin(qd, de)}

    def dec_layer():
        return {
            "ln_pe_1": norm(Dd), "ln_pe_2": norm(D),
            "ln1": norm(Dd), "self_attn": dec_attn(Dd, Dd, Dd),
            "ln2_1": norm(Dd), "ln2_2": norm(D),
            "cross_attn": dec_attn(Dd, D, D),
            "ln3": norm(Dd), "ffn": ffn(Dd, cfg.decoder_mlp_dim, Dd),
        }

    # MHR body with a consistent tiny/production parameter system:
    # params = 136 pose + 68 scales = 204; joint DOFs = J*7
    n_params = 204
    n_skin = V * 3  # ~3 influences per vertex
    pc_hidden = 64 if V < 4096 else 3000
    pc_k = min(4 * (J - 2) * 6, 2048)
    body_model = {
        "joint_translation_offsets": rn(J, 3, scale=1.0),
        "joint_prerotations": jnp.concatenate(
            [jnp.zeros((J, 3), dtype), jnp.ones((J, 1), dtype)], axis=1),
        "joint_parents": jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32),
             jnp.arange(J - 1, dtype=jnp.int32)]),
        "parameter_transform": rn(J * 7, 249, scale=0.05),
        "base_shape": rn(V, 3, scale=1.0),
        "shape_vectors": rn(cfg.num_shape_comps, V, 3),
        "face_shape_vectors": rn(cfg.num_face_comps, V, 3),
        "inverse_bind_pose": jnp.concatenate(
            [jnp.zeros((J, 3), dtype), jnp.zeros((J, 3), dtype),
             jnp.ones((J, 2), dtype)], axis=1),
        "skin_indices": jax.random.randint(next(ks), (n_skin,), 0, J),
        "skin_weights": jnp.full((n_skin,), 1.0 / 3.0, dtype),
        "vert_indices": jnp.tile(jnp.arange(V, dtype=jnp.int32), 3),
        "pc_sparse_indices": jnp.stack([
            jax.random.randint(next(ks), (pc_k,), 0, pc_hidden),
            jax.random.randint(next(ks), (pc_k,), 0, (J - 2) * 6)]),
        "pc_sparse_weight": rn(pc_k),
        "pc_linear_weight": rn(V * 3, pc_hidden, scale=0.001),
    }
    head_pose = {
        "proj": ffn(Dd, Dd, cfg.pose_output_dim),
        "body_model": body_model,
        "scale_mean": jnp.zeros((68,), dtype),
        "scale_comps": rn(28, 68),
        "hand_pose_mean": jnp.zeros((54,), dtype),
        "hand_pose_comps": rn(54, 54),
        "hand_joint_idxs_left": jnp.arange(62, 89, dtype=jnp.int32) + 6,
        "hand_joint_idxs_right": jnp.arange(89, 116, dtype=jnp.int32) + 6,
        "keypoint_mapping": rn(308, V + J, scale=0.01),
    }
    del n_params
    return {
        "backbone": {
            "cls_token": rn(1, 1, D),
            "storage_tokens": rn(1, cfg.num_storage_tokens, D),
            "patch_embed": {"projection": {
                "weight": rn(cfg.patch_size, cfg.patch_size, 3, D),
                "bias": jnp.zeros((D,), dtype)}},
            "rope_embed": {"periods": 100.0 ** (
                2.0 * jnp.arange(hd // 4, dtype=jnp.float32) / (hd // 2))},
            "blocks": stack(cfg.depth, vit_block),
            "norm": norm(D),
        },
        "decoder": {"layers": stack(cfg.decoder_depth, dec_layer),
                    "norm_final": norm(Dd)},
        "head_pose": head_pose,
        "head_camera": {"proj": ffn(Dd, Dd, cfg.camera_output_dim)},
        "prompt_encoder": {
            "pe_layer": {"positional_encoding_gaussian_matrix":
                         rn(2, P // 2, scale=1.0)},
            "point_embeddings": {"weight": rn(n_kp, P)},
            "not_a_point_embed": {"weight": rn(1, P)},
            "invalid_point_embed": {"weight": rn(1, P)},
            "no_mask_embed": {"weight": rn(1, P)},
        },
        "init_to_token_mhr": lin(Dd, cfg.pose_output_dim
                                 + cfg.camera_output_dim + 3),
        "prev_to_token_mhr": lin(Dd, cfg.pose_output_dim
                                 + cfg.camera_output_dim),
        "prompt_to_token": lin(Dd, P),
        "init_pose": jnp.zeros((1, cfg.pose_output_dim), dtype),
        "init_camera": jnp.zeros((1, cfg.camera_output_dim), dtype),
        "keypoint_embedding": rn(n_kp, Dd),
        "keypoint3d_embedding": rn(n_kp, Dd),
        "keypoint_feat_linear": lin(Dd, D),
        "keypoint_posemb_linear": ffn(2, Dd, Dd),
        "keypoint3d_posemb_linear": ffn(3, Dd, Dd),
        "hand_box_embedding": rn(2, Dd),
        "hand_cls_embed": lin(2, Dd),
        "bbox_embed": {"layers": {"0": lin(Dd, Dd), "1": lin(Dd, Dd),
                                  "2": lin(4, Dd)}},
        "ray_cond_emb": {
            "conv": {"weight": rn(1, 1, D + 99, D),
                     "bias": jnp.zeros((D,), dtype)},
            "norm": norm(D)},
    }
