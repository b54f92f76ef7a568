"""torch→flax weight mapping for reference GFLA checkpoints.

One-way converter so reference-released `.pth` generator weights can
validate numerics / seed training (SURVEY.md §7 hard part 6). Layer
mappings (all verified numerically against torch.nn.functional in
tests/test_torch_convert.py):

* Conv2d weight (O, I, kh, kw) → flax kernel (kh, kw, I, O)
* ConvTranspose2d(k3 s2 p1 op1) weight (I, O, kh, kw) → flax
  ConvTranspose(padding ((1,2),(1,2))) kernel = spatial-flip then
  (kh, kw, I, O)
* InstanceNorm2d weight/bias → InstanceNorm scale/bias
* ExtractorAttn fully_connect_layer.0 (D, 2C, k, k) →
  w1 (k², 2C, D) with k² = i·k+j; .2 (k², D, 1, 1) → w2 (D, k²)

Structural walk mirrors the reference module tree (generator.py): the
torch Sequential index for each logical layer depends on whether the block
has norm layers (norm 'none' drops them).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _strip_module(state_dict):
    """Drop DataParallel 'module.' prefixes; keeps the original mapping when
    nothing needs stripping (preserves tracking-dict wrappers in tests)."""
    if any(k.startswith("module.") for k in state_dict):
        return {k.replace("module.", ""): v for k, v in state_dict.items()}
    return state_dict


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def map_conv(w) -> np.ndarray:
    """(O, I, kh, kw) → (kh, kw, I, O)."""
    return _np(w).transpose(2, 3, 1, 0)


def map_conv_transpose(w) -> np.ndarray:
    """(I, O, kh, kw) → flip spatial → (kh, kw, I, O)."""
    w = _np(w)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def map_attn_conv1(w) -> np.ndarray:
    """(D, 2C, k, k) → (k², 2C, D)."""
    w = _np(w)
    d, c2, k, _ = w.shape
    return w.transpose(2, 3, 1, 0).reshape(k * k, c2, d)


def map_attn_conv2(w) -> np.ndarray:
    """(k², D, 1, 1) → (D, k²)."""
    w = _np(w)
    return w[:, :, 0, 0].transpose(1, 0)


def _norm(sd, key):
    """Instance-norm affine params. The flax `Norm` factory nests an
    `InstanceNorm_0` child scope (nn/norms.py:58-71)."""
    return {"InstanceNorm_0": {
        "scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"]),
    }}


def _conv2d(sd, key):
    out = {"Conv_0": {"kernel": map_conv(sd[f"{key}.weight"])}}
    if f"{key}.bias" in sd:
        out["Conv_0"]["bias"] = _np(sd[f"{key}.bias"])
    return out


def _convT(sd, key):
    out = {"ConvTranspose_0": {"kernel": map_conv_transpose(sd[f"{key}.weight"])}}
    if f"{key}.bias" in sd:
        out["ConvTranspose_0"]["bias"] = _np(sd[f"{key}.bias"])
    return out


def _encoder_block(sd, prefix, has_norm=True):
    """EncoderBlock: Sequential [norm, act, conv1, norm, act, conv2] with
    norms, else [act, conv1, act, conv2] (base_function.py:346-350)."""
    if has_norm:
        return {
            "norm1": _norm(sd, f"{prefix}.model.0"),
            "conv1": _conv2d(sd, f"{prefix}.model.2"),
            "norm2": _norm(sd, f"{prefix}.model.3"),
            "conv2": _conv2d(sd, f"{prefix}.model.5"),
        }
    return {
        "conv1": _conv2d(sd, f"{prefix}.model.1"),
        "conv2": _conv2d(sd, f"{prefix}.model.3"),
    }


def _resblock(sd, prefix, has_norm=True):
    out = {}
    if has_norm:
        out["norm1"] = _norm(sd, f"{prefix}.model.0")
        out["conv1"] = _conv2d(sd, f"{prefix}.model.2")
        out["norm2"] = _norm(sd, f"{prefix}.model.3")
        out["conv2"] = _conv2d(sd, f"{prefix}.model.5")
    else:
        out["conv1"] = _conv2d(sd, f"{prefix}.model.1")
        out["conv2"] = _conv2d(sd, f"{prefix}.model.3")
    if f"{prefix}.shortcut.0.weight" in sd:
        out["shortcut"] = _conv2d(sd, f"{prefix}.shortcut.0")
    return out


def _resblock_decoder(sd, prefix, has_norm=True):
    out = {}
    if has_norm:
        out["norm1"] = _norm(sd, f"{prefix}.model.0")
        out["conv1"] = {"Conv_0": {
            "kernel": map_conv(sd[f"{prefix}.model.2.weight"]),
            "bias": _np(sd[f"{prefix}.model.2.bias"]),
        }}
        out["norm2"] = _norm(sd, f"{prefix}.model.3")
        out["conv2"] = {"ConvTranspose_0": {
            "kernel": map_conv_transpose(sd[f"{prefix}.model.5.weight"]),
            "bias": _np(sd[f"{prefix}.model.5.bias"]),
        }}
    else:
        out["conv1"] = {"Conv_0": {
            "kernel": map_conv(sd[f"{prefix}.model.1.weight"]),
            "bias": _np(sd[f"{prefix}.model.1.bias"]),
        }}
        out["conv2"] = {"ConvTranspose_0": {
            "kernel": map_conv_transpose(sd[f"{prefix}.model.3.weight"]),
            "bias": _np(sd[f"{prefix}.model.3.bias"]),
        }}
    out["shortcut"] = {"ConvTranspose_0": {
        "kernel": map_conv_transpose(sd[f"{prefix}.shortcut.0.weight"]),
        "bias": _np(sd[f"{prefix}.shortcut.0.bias"]),
    }}
    return out


def _jump(sd, prefix):
    """Jump / Output with norm None: Sequential [act, pad, conv]."""
    return {"conv1": _conv2d(sd, f"{prefix}.conv1")}


def _attn(sd, prefix):
    return {
        "w1": map_attn_conv1(sd[f"{prefix}.fully_connect_layer.0.weight"]),
        "b1": _np(sd[f"{prefix}.fully_connect_layer.0.bias"]),
        "w2": map_attn_conv2(sd[f"{prefix}.fully_connect_layer.2.weight"]),
        "b2": _np(sd[f"{prefix}.fully_connect_layer.2.bias"]),
    }


def _conv_sn(sd, key):
    """Spectral-normalized conv (torch spectral_norm state_dict layout:
    `weight_orig` / `weight_u` / `weight_v`). Returns (params, batch_stats)
    for the flax Conv2d+SpectralNorm wrapper; u carries over directly
    because flax's power iteration is torch's with the weight matricized as
    (kh·kw·I, O) instead of (O, I·kh·kw) — a column permutation + transpose,
    which leaves u (dim O), sigma, and the normalized weight unchanged."""
    w = sd[f"{key}.weight_orig"]
    kernel = map_conv(w) if len(_np(w).shape) == 4 else map_conv3d(w)
    params = {"Conv_0": {"kernel": kernel}}
    if f"{key}.bias" in sd:
        params["Conv_0"]["bias"] = _np(sd[f"{key}.bias"])
    stats = {
        "SpectralNorm_0": {
            "Conv_0/kernel/u": _np(sd[f"{key}.weight_u"]).reshape(1, -1),
            "Conv_0/kernel/sigma": np.ones((), np.float32),
        }
    }
    return params, stats


def map_conv3d(w) -> np.ndarray:
    """(O, I, kd, kh, kw) → (kd, kh, kw, I, O)."""
    return _np(w).transpose(2, 3, 4, 1, 0)


def _resblock_encoder_sn(sd, prefix):
    """ResBlockEncoder, norm 'none' + spectral norm (the discriminator
    config, reference discriminator.py:31 / base_function.py:533-556).
    Torch Sequential indices: model.1 conv3s1, model.3 conv4s2,
    shortcut.1 conv1x1 (shortcut.0 is the AvgPool)."""
    params, stats = {}, {}
    for ours, theirs in (("conv1", "model.1"), ("conv2", "model.3"),
                         ("shortcut", "shortcut.1")):
        p, s = _conv_sn(sd, f"{prefix}.{theirs}")
        params[ours], stats[ours] = p, s
    return params, stats


def convert_res_discriminator(state_dict: Dict[str, Any],
                              layers: int = 4) -> Dict[str, Any]:
    """Reference ResDiscriminator state_dict → flax variables
    ({params, batch_stats}) for gfla_tpu.models.discriminators
    .ResDiscriminator. Reference tree: discriminator.py:20-39."""
    sd = _strip_module(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["block0"], stats["block0"] = _resblock_encoder_sn(sd, "block0")
    for i in range(layers - 1):
        params[f"encoder{i}"], stats[f"encoder{i}"] = _resblock_encoder_sn(
            sd, f"encoder{i}"
        )
    params["conv"], stats["conv"] = _conv_sn(sd, "conv")
    return {"params": params, "batch_stats": stats}


def convert_temporal_discriminator(state_dict: Dict[str, Any],
                                   input_length: int = 6,
                                   ndf: int = 64,
                                   layers: int = 4) -> Dict[str, Any]:
    """Reference TemporalDiscriminator state_dict → flax variables.

    The reference folds (b, c, l, h, w) → (b, c·l, h, w) channel-major
    (discriminator.py:134-135); our NHWC fold is time-major (t·C + c).
    encoder0's input-facing convs therefore get an input-channel
    permutation: flax index t·C+c reads torch index c·L+t."""
    sd = _strip_module(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for name in ("block0", "block1"):
        p, s = {}, {}
        for ours, theirs in (("conv1", "model.1"), ("conv2", "model.3"),
                             ("shortcut", "shortcut.1")):
            pp, ss = _conv_sn(sd, f"{name}.{theirs}")
            p[ours], s[ours] = pp, ss
        params[name], stats[name] = p, s

    L = input_length - 4  # time length after the two 3-D blocks
    C = 2 * ndf
    # flax folded index t*C + c  ←  torch folded index c*L + t
    idx = np.array([(f % C) * L + f // C for f in range(L * C)])

    for i in range(layers - 2):
        p, s = _resblock_encoder_sn(sd, f"encoder{i}")
        if i == 0:
            for key in ("conv1", "shortcut"):
                k = p[key]["Conv_0"]["kernel"]  # (kh, kw, I, O)
                p[key]["Conv_0"]["kernel"] = k[:, :, idx, :]
        params[f"encoder{i}"], stats[f"encoder{i}"] = p, s
    params["conv"], stats["conv"] = _conv_sn(sd, "conv")
    return {"params": params, "batch_stats": stats}


def _source_walk(sd, prefix: str, layers: int) -> Dict[str, Any]:
    """PoseSourceNet subtree (reference generator.py:40-57)."""
    out = {"block0": _encoder_block(sd, f"{prefix}.block0")}
    for i in range(layers - 1):
        out[f"encoder{i}"] = _encoder_block(sd, f"{prefix}.encoder{i}")
    return out


def _flow_walk(sd, prefix: str, attn_layer, flow_layers: int = 5,
               encode_input: bool = True) -> Dict[str, Any]:
    """Flow U-Net subtree shared by Pose/Face/ShapeNet flow nets
    (generator.py:170-242, 508-547, 672-714). Flow/mask head channel widths
    (2/1 pose, 4/2 face) don't change the key layout."""
    fn: Dict[str, Any] = {}
    if encode_input:
        fn["block0"] = _encoder_block(sd, f"{prefix}.block0")
    for i in range(flow_layers - 1):
        fn[f"encoder{i}"] = _encoder_block(sd, f"{prefix}.encoder{i}")
    for i in range(flow_layers - min(attn_layer)):
        fn[f"decoder{i}"] = _resblock_decoder(sd, f"{prefix}.decoder{i}")
        fn[f"jump{i}"] = _jump(sd, f"{prefix}.jump{i}")
        if flow_layers - i - 1 in attn_layer:
            fn[f"output{i}"] = {"Conv_0": {
                "kernel": map_conv(sd[f"{prefix}.output{i}.weight"]),
                "bias": _np(sd[f"{prefix}.output{i}.bias"]),
            }}
            fn[f"mask{i}"] = {"Conv_0": {
                "kernel": map_conv(sd[f"{prefix}.mask{i}.0.weight"]),
                "bias": _np(sd[f"{prefix}.mask{i}.0.bias"]),
            }}
    return fn


def _target_walk(sd, prefix: str, layers: int, attn_layer,
                 num_blocks: int = 2, paired_attn: bool = False,
                 encoder_input: bool = True) -> Dict[str, Any]:
    """Target decoder subtree: PoseTargetNet (generator.py:73-115),
    FaceTargetNet (paired_attn, :429-479), ShapeNetTargetNet
    (encoder_input=False: 8×8-seed ResBlockDecoders, :614-649)."""
    tg: Dict[str, Any] = {}
    if encoder_input:
        tg["block0"] = _encoder_block(sd, f"{prefix}.block0")
        for i in range(layers - 1):
            tg[f"encoder{i}"] = _encoder_block(sd, f"{prefix}.encoder{i}")
    else:
        tg["block0"] = _resblock_decoder(sd, f"{prefix}.block0")
        tg["block1"] = _resblock_decoder(sd, f"{prefix}.block1")
    for i in range(layers):
        if layers - i in attn_layer:
            if paired_attn:
                tg[f"attn_p{i}"] = _attn(sd, f"{prefix}.attn_p{i}")
                tg[f"attn_r{i}"] = _attn(sd, f"{prefix}.attn_r{i}")
            else:
                tg[f"attn{i}"] = _attn(sd, f"{prefix}.attn{i}")
        if num_blocks > 1:
            # Sequential(ResBlocks(model=[ResBlock]), ResBlockDecoder)
            tg[f"decoder{i}_res"] = {
                "block0": _resblock(sd, f"{prefix}.decoder{i}.0.model.0"),
            }
            tg[f"decoder{i}"] = _resblock_decoder(sd, f"{prefix}.decoder{i}.1")
        else:
            tg[f"decoder{i}"] = _resblock_decoder(sd, f"{prefix}.decoder{i}.0")
    tg["outconv"] = {"conv1": _conv2d(sd, f"{prefix}.outconv.conv1")}
    return tg


def convert_pose_generator(state_dict: Dict[str, Any], layers: int = 3,
                           attn_layer=(2, 3), num_blocks: int = 2,
                           flow_layers: int = 5) -> Dict[str, Any]:
    """Reference PoseGenerator state_dict → flax params tree for
    gfla_tpu.models.generators.PoseGenerator (instance-norm config)."""
    sd = _strip_module(state_dict)
    return {
        "source": _source_walk(sd, "source", layers),
        "flow_net": _flow_walk(sd, "flow_net", attn_layer, flow_layers),
        "target": _target_walk(sd, "target", layers, attn_layer, num_blocks),
    }


def convert_face_generator(state_dict: Dict[str, Any], layers: int = 3,
                           attn_layer=(2, 3), num_blocks: int = 2,
                           flow_layers: int = 5) -> Dict[str, Any]:
    """Reference FaceGenerator state_dict → flax params tree for
    gfla_tpu.models.generators.FaceGenerator (reference module tree:
    generator.py:388-399 — source_previous/source_reference/target/flow_net)."""
    sd = _strip_module(state_dict)
    return {
        "source_previous": _source_walk(sd, "source_previous", layers),
        "source_reference": _source_walk(sd, "source_reference", layers),
        "flow_net": _flow_walk(sd, "flow_net", attn_layer, flow_layers),
        "target": _target_walk(sd, "target", layers, attn_layer, num_blocks,
                               paired_attn=True),
    }


def convert_dance_generator(state_dict: Dict[str, Any], layers: int = 3,
                            attn_layer=(2, 3), num_blocks: int = 2,
                            flow_layers: int = 5) -> Dict[str, Any]:
    """Reference DanceGenerator state_dict → flax params tree
    (generator.py:264-282 — two PoseFlowNets + shared FaceTargetNet)."""
    sd = _strip_module(state_dict)
    return {
        "source_previous": _source_walk(sd, "source_previous", layers),
        "source_reference": _source_walk(sd, "source_reference", layers),
        "flow_net_previous": _flow_walk(sd, "flow_net_previous", attn_layer,
                                        flow_layers),
        "flow_net_reference": _flow_walk(sd, "flow_net_reference", attn_layer,
                                         flow_layers),
        "target": _target_walk(sd, "target", layers, attn_layer, num_blocks,
                               paired_attn=True),
    }


def map_conv1d(w) -> np.ndarray:
    """torch Conv1d weight (O, I, k) → flax Conv kernel (k, I, O)."""
    return _np(w).transpose(2, 1, 0)


def _dense(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).T, "bias": _np(sd[f"{key}.bias"])}


def convert_kp_generator(state_dict: Dict[str, Any], layers: int = 4) -> Dict[str, Any]:
    """Reference KPInput2DGenerator state_dict → flax params for
    gfla_tpu.models.keypoint_net.KPInput2DGenerator (reference module tree:
    generator.py:320-364 — everything under `kp_input.`)."""
    sd = _strip_module(state_dict)
    p = "kp_input"
    kp: Dict[str, Any] = {
        "expand_conv": {"kernel": map_conv1d(sd[f"{p}.expand_conv.weight"])},
        "expand_ln": {
            "scale": _np(sd[f"{p}.expand_ln.weight"]).reshape(-1),
            "bias": _np(sd[f"{p}.expand_ln.bias"]).reshape(-1),
        },
        "shrink": {"kernel": map_conv1d(sd[f"{p}.shrink.weight"]),
                   "bias": _np(sd[f"{p}.shrink.bias"])},
    }
    for i in range(1, 4):
        kp[f"feature_conv_{i}"] = {
            "kernel": map_conv1d(sd[f"{p}.feature_conv_{i}.weight"])
        }
    for j in range(2 * (layers - 1)):
        kp[f"conv_{j}"] = {
            "kernel": map_conv1d(sd[f"{p}.layers_conv.{j}.weight"])
        }
        kp[f"ln_{j}"] = {
            "mlp_shared": _dense(sd, f"{p}.layers_ln.{j}.mlp_shared.0"),
            "mlp_gamma": _dense(sd, f"{p}.layers_ln.{j}.mlp_gamma"),
            "mlp_beta": _dense(sd, f"{p}.layers_ln.{j}.mlp_beta"),
        }
    return {"kp_input": kp}


def convert_shapenet_generator(state_dict: Dict[str, Any], layers: int = 3,
                               attn_layer=(2, 3), num_blocks: int = 2,
                               flow_layers: int = 5) -> Dict[str, Any]:
    """Reference ShapeNetGenerator state_dict → flax params tree
    (generator.py:590-604; flow net fuses the viewpoint difference at the
    bottleneck via the `cat` ResBlocks, :695)."""
    sd = _strip_module(state_dict)
    fn = _flow_walk(sd, "flow_net", attn_layer, flow_layers)
    fn["cat"] = {"block0": _resblock(sd, "flow_net.cat.model.0")}
    return {
        "source": _source_walk(sd, "source", layers),
        "flow_net": fn,
        "target": _target_walk(sd, "target", layers, attn_layer, num_blocks,
                               encoder_input=False),
    }
