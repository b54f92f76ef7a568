"""Generator networks (flax.linen, NHWC).

Capability parity with reference model/networks/generator.py. Architecture
notes common to all heads:

* Encoders halve resolution per EncoderBlock with channel progression
  ngf·min(2^i, img_f/ngf)  (generator.py:51-57).
* Flow U-Nets decode `encoder_layer - min(attn_layer)` levels with Jump
  skip adapters, emitting a 3×3-conv flow head (2ch) and sigmoid mask head
  (1ch) at every level l = encoder_layer - i - 1 ∈ attn_layer, returning
  coarse→fine lists (generator.py:170-242).
* Target decoders fuse warped source features at attention layers:
  out = out·(1-mask) + attn(source_feat, out, flow)·mask
  (generator.py:118-137).

Flow tensors are (B, H, W, 2) with (x, y) channels in feature-pixel units.
Feature pyramids are returned coarsest-first (including the raw input last),
matching the reference's reversed list (generator.py:60-70).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfla_tpu.nn.attention import ExtractorAttn
from gfla_tpu.nn.blocks import (
    EncoderBlock,
    Jump,
    Output,
    ResBlockDecoder,
    ResBlocks,
)
from gfla_tpu.nn.norms import Conv2d


def _mult(i: int, ngf: int, img_f: int) -> int:
    return min(2**i, img_f // ngf)


class PoseSourceNet(nn.Module):
    """Source appearance encoder → reversed feature pyramid incl. input
    (generator.py:40-70)."""

    ngf: int = 64
    img_f: int = 1024
    layers: int = 6
    norm_type: str = "batch"
    activation: str = "ReLU"
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, source, train=True, update_stats=True):
        feats = [source]
        kw = dict(
            norm_type=self.norm_type,
            activation=self.activation,
            use_spect=self.use_spect,
            use_coord=self.use_coord,
        )
        out = EncoderBlock(self.ngf, name="block0", **kw)(
            source, train, update_stats
        )
        feats.append(out)
        for i in range(self.layers - 1):
            out = EncoderBlock(
                self.ngf * _mult(i + 1, self.ngf, self.img_f),
                name=f"encoder{i}", **kw,
            )(out, train, update_stats)
            feats.append(out)
        return list(reversed(feats))


class PoseFlowNet(nn.Module):
    """Flow U-Net (generator.py:170-242). Returns (flows, masks) coarse→fine."""

    ngf: int = 32
    img_f: int = 256
    encoder_layer: int = 5
    attn_layer: Sequence[int] = (1, 2)
    norm_type: str = "batch"
    activation: str = "ReLU"
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, source, source_b, target_b, train=True, update_stats=True):
        inputs = jnp.concatenate([source, source_b, target_b], axis=-1)
        return self.decode(self.encode(inputs, train, update_stats),
                           train, update_stats)

    def encode(self, inputs, train=True, update_stats=True):
        kw = dict(
            norm_type=self.norm_type,
            activation=self.activation,
            use_spect=self.use_spect,
            use_coord=self.use_coord,
        )
        out = EncoderBlock(self.ngf, name="block0", **kw)(
            inputs, train, update_stats
        )
        result = [out]
        for i in range(self.encoder_layer - 1):
            out = EncoderBlock(
                self.ngf * _mult(i + 1, self.ngf, self.img_f),
                name=f"encoder{i}", **kw,
            )(out, train, update_stats)
            result.append(out)
        return result

    def decode(self, result, train=True, update_stats=True):
        decoder_layer = self.encoder_layer - min(self.attn_layer)
        kw = dict(
            norm_type=self.norm_type,
            activation=self.activation,
            use_spect=self.use_spect,
        )
        flows: List[jax.Array] = []
        masks: List[jax.Array] = []
        out = result[-1]
        for i in range(decoder_layer):
            level = self.encoder_layer - i - 2  # encoder feature to skip from
            mult = _mult(level, self.ngf, self.img_f) if level >= 0 else 1
            nc = self.ngf * mult
            out = ResBlockDecoder(nc, nc, name=f"decoder{i}", **kw)(
                out, train, update_stats
            )
            jump = Jump(
                nc, 3, norm_type="none", activation=self.activation,
                use_spect=self.use_spect, use_coord=self.use_coord,
                name=f"jump{i}",
            )(result[self.encoder_layer - i - 2], train, update_stats)
            out = out + jump
            if self.encoder_layer - i - 1 in self.attn_layer:
                flow = Conv2d(2, (3, 3), (1, 1), 1, name=f"output{i}")(out)
                mask = jax.nn.sigmoid(
                    Conv2d(1, (3, 3), (1, 1), 1, name=f"mask{i}")(out)
                )
                flows.append(flow)
                masks.append(mask)
        return flows, masks


class PoseTargetNet(nn.Module):
    """Target decoder with local-attention fusion (generator.py:73-137)."""

    output_nc: int = 3
    ngf: int = 64
    img_f: int = 1024
    layers: int = 6
    num_blocks: int = 2
    norm_type: str = "batch"
    activation: str = "ReLU"
    attn_layer: Sequence[int] = (1, 2)
    extractor_kz: Dict[str, int] = None
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, target_b, source_feature, flow_fields, masks,
                 train=True, update_stats=True, return_hooks=False):
        kw = dict(
            norm_type=self.norm_type,
            activation=self.activation,
            use_spect=self.use_spect,
            use_coord=self.use_coord,
        )
        out = EncoderBlock(self.ngf, name="block0", **kw)(
            target_b, train, update_stats
        )
        for i in range(self.layers - 1):
            out = EncoderBlock(
                self.ngf * _mult(i + 1, self.ngf, self.img_f),
                name=f"encoder{i}", **kw,
            )(out, train, update_stats)

        hooks = {"target": [], "source": [], "attn": [], "mask": []}
        counter = 0
        for i in range(self.layers):
            if self.layers - i in self.attn_layer:
                k = self.extractor_kz[str(self.layers - i)]
                attn_mod = ExtractorAttn(
                    k, activation=self.activation, name=f"attn{i}"
                )
                if return_hooks:
                    attn_w, out_attn = attn_mod(
                        source_feature[i], out, flow_fields[counter],
                        return_attn=True,
                    )
                else:
                    # hot path: no attention-map materialization (and the
                    # fused Pallas kernel can engage)
                    out_attn = attn_mod(
                        source_feature[i], out, flow_fields[counter]
                    )
                out = out * (1 - masks[counter]) + out_attn * masks[counter]
                if return_hooks:
                    hooks["target"].append(out)
                    hooks["source"].append(source_feature[i])
                    hooks["attn"].append(attn_w)
                    hooks["mask"].append(masks[counter])
                counter += 1

            mult = _mult(self.layers - i - 2, self.ngf, self.img_f) \
                if i != self.layers - 1 else 1
            nc_out = self.ngf * mult
            if self.num_blocks > 1:
                out = ResBlocks(
                    self.num_blocks - 1,
                    norm_type=self.norm_type, activation=self.activation,
                    use_spect=self.use_spect, use_coord=self.use_coord,
                    name=f"decoder{i}_res",
                )(out, train, update_stats)
            out = ResBlockDecoder(
                nc_out, None, norm_type=self.norm_type,
                activation=self.activation, use_spect=self.use_spect,
                name=f"decoder{i}",
            )(out, train, update_stats)

        img = Output(
            self.output_nc, 3, norm_type="none", activation=self.activation,
            use_spect=self.use_spect, use_coord=self.use_coord, name="outconv",
        )(out, train, update_stats)
        if return_hooks:
            return img, hooks
        return img


class PoseGenerator(nn.Module):
    """Pose transfer generator = source encoder + flow U-Net + target decoder
    (generator.py:13-36). Flow subnet always instance-norm-free config of the
    parent: ngf=32, img_f=256, encoder_layer=5 (generator.py:21-23)."""

    image_nc: int = 3
    structure_nc: int = 18
    output_nc: int = 3
    ngf: int = 64
    img_f: int = 1024
    layers: int = 6
    num_blocks: int = 2
    norm_type: str = "batch"
    activation: str = "ReLU"
    attn_layer: Sequence[int] = (1, 2)
    extractor_kz: Dict[str, int] = None
    use_spect: bool = False
    use_coord: bool = False

    def setup(self):
        self.source = PoseSourceNet(
            self.ngf, self.img_f, self.layers, self.norm_type,
            self.activation, self.use_spect, self.use_coord, name="source",
        )
        self.target = PoseTargetNet(
            output_nc=self.output_nc, ngf=self.ngf, img_f=self.img_f,
            layers=self.layers, num_blocks=self.num_blocks,
            norm_type=self.norm_type, activation=self.activation,
            attn_layer=tuple(self.attn_layer), extractor_kz=self.extractor_kz,
            use_spect=self.use_spect, use_coord=self.use_coord, name="target",
        )
        self.flow_net = PoseFlowNet(
            ngf=32, img_f=256, encoder_layer=5,
            attn_layer=tuple(self.attn_layer), norm_type=self.norm_type,
            activation=self.activation, use_spect=self.use_spect,
            use_coord=self.use_coord, name="flow_net",
        )

    def __call__(self, source, source_b, target_b, train=True,
                 update_stats=True, return_hooks=False):
        feature_list = self.source(source, train, update_stats)
        flow_fields, masks = self.flow_net(
            source, source_b, target_b, train, update_stats
        )
        out = self.target(
            target_b, feature_list, flow_fields, masks, train, update_stats,
            return_hooks=return_hooks,
        )
        if return_hooks:
            img, hooks = out
            return img, flow_fields, masks, hooks
        return out, flow_fields, masks


class PoseFlowNetGenerator(nn.Module):
    """Stage-1 flow pretraining head (generator.py:244-259). Named `flow_net`
    so its checkpoint loads directly into PoseGenerator.flow_net (the
    two-stage protocol, SURVEY.md §3.4)."""

    image_nc: int = 3
    structure_nc: int = 18
    ngf: int = 32
    img_f: int = 256
    encoder_layer: int = 5
    attn_layer: Sequence[int] = (1, 2)
    norm_type: str = "batch"
    activation: str = "ReLU"
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, source, source_b, target_b, train=True, update_stats=True):
        return PoseFlowNet(
            ngf=self.ngf, img_f=self.img_f, encoder_layer=self.encoder_layer,
            attn_layer=tuple(self.attn_layer), norm_type=self.norm_type,
            activation=self.activation, use_spect=self.use_spect,
            use_coord=self.use_coord, name="flow_net",
        )(source, source_b, target_b, train, update_stats)


# ---------------------------------------------------------------------------
# Face / Dance (recurrent animation) generators
# ---------------------------------------------------------------------------

def _scan_frames(module, frame_step, p_prev, bp_prev, xs_bt, use_scan,
                 remat=False):
    """Run the per-frame recurrence as a single `nn.scan` (SURVEY.md §5: the
    TPU equivalent of the reference's Python frame loop, generator.py:284-316
    — compile time stays O(1) in n_frames instead of O(T)).

    frame_step: (module, (p_prev, bp_prev), x_t) →
                ((img, bp_t), (img, flows, masks, p_prev)),
    where x_t is the per-frame slice of the `xs_bt` pytree (every leaf
    (B, T, ...) — the skeleton frames, plus any per-frame inputs hoisted
    out of the recurrence, e.g. the dance reference-stream flows).
    Returns (gen (B,T,H,W,C), flows [levels × (B,T,h,w,2)],
             masks [levels × (B,T,h,w,1)], prev (B,T,H,W,C)).
    The unrolled fallback (use_scan=False) computes the identical function —
    kept as the equivalence oracle for tests.

    remat=True checkpoints each frame: only frame-boundary residuals (the
    carries + per-frame outputs) survive the forward pass and each frame's
    internals are recomputed during its backward sweep — peak activation
    HBM drops from O(T) frames to O(1), which is what lets a full
    reference-sized chunk (batch 4 × 6 frames at 256²) fit one chip.
    """
    tmap = jax.tree_util.tree_map
    n_frames = jax.tree_util.tree_leaves(xs_bt)[0].shape[1]
    if remat:
        # prevent_cse is unnecessary (and costly) inside scan's loop body
        frame_step = nn.remat(frame_step, prevent_cse=False)
    if use_scan and n_frames > 1:
        scan = nn.scan(
            frame_step,
            variable_broadcast="params",
            variable_carry="batch_stats",
            split_rngs={"params": False},
        )
        xs = tmap(lambda a: jnp.moveaxis(a, 1, 0), xs_bt)  # (T, B, ...)
        _, (gen, flows, masks, prev) = scan(module, (p_prev, bp_prev), xs)
        bt = lambda a: jnp.moveaxis(a, 0, 1)
        return bt(gen), [bt(f) for f in flows], [bt(m) for m in masks], bt(prev)

    gen, flows_all, masks_all, prev_all = [], [], [], []
    carry = (p_prev, bp_prev)
    for t in range(n_frames):
        carry, (img, flows, masks, prev) = frame_step(
            module, carry, tmap(lambda a: a[:, t], xs_bt)
        )
        gen.append(img)
        flows_all.append(flows)
        masks_all.append(masks)
        prev_all.append(prev)
    stack = lambda per_frame: [
        jnp.stack([fr[l] for fr in per_frame], axis=1)
        for l in range(len(per_frame[0]))
    ]
    return (
        jnp.stack(gen, axis=1),
        stack(flows_all),
        stack(masks_all),
        jnp.stack(prev_all, axis=1),
    )


class FaceTargetNet(nn.Module):
    """Target decoder with paired previous/reference attention
    (generator.py:429-505): out = out_p + out_r where each stream applies
    mask-gated attention fusion against its own source features."""

    output_nc: int = 3
    ngf: int = 64
    img_f: int = 1024
    layers: int = 6
    num_blocks: int = 2
    norm_type: str = "batch"
    activation: str = "ReLU"
    attn_layer: Sequence[int] = (1, 2)
    extractor_kz: Dict[str, int] = None
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, bp, prev_features, ref_features, flow_fields, masks,
                 train=True, update_stats=True):
        kw = dict(
            norm_type=self.norm_type, activation=self.activation,
            use_spect=self.use_spect, use_coord=self.use_coord,
        )
        out = EncoderBlock(self.ngf, name="block0", **kw)(bp, train, update_stats)
        for i in range(self.layers - 1):
            out = EncoderBlock(
                self.ngf * _mult(i + 1, self.ngf, self.img_f),
                name=f"encoder{i}", **kw,
            )(out, train, update_stats)

        counter = 0
        for i in range(self.layers):
            if self.layers - i in self.attn_layer:
                k = self.extractor_kz[str(self.layers - i)]
                attn_p = ExtractorAttn(k, activation=self.activation,
                                       name=f"attn_p{i}")
                attn_r = ExtractorAttn(k, activation=self.activation,
                                       name=f"attn_r{i}")
                out_p_attn = attn_p(prev_features[i], out, flow_fields[2 * counter])
                out_r_attn = attn_r(ref_features[i], out, flow_fields[2 * counter + 1])
                out_p = out * (1 - masks[2 * counter]) \
                    + out_p_attn * masks[2 * counter]
                out_r = out * (1 - masks[2 * counter + 1]) \
                    + out_r_attn * masks[2 * counter + 1]
                out = out_p + out_r
                counter += 1

            mult = _mult(self.layers - i - 2, self.ngf, self.img_f) \
                if i != self.layers - 1 else 1
            if self.num_blocks > 1:
                out = ResBlocks(
                    self.num_blocks - 1, norm_type=self.norm_type,
                    activation=self.activation, use_spect=self.use_spect,
                    use_coord=self.use_coord, name=f"decoder{i}_res",
                )(out, train, update_stats)
            out = ResBlockDecoder(
                self.ngf * mult, None, norm_type=self.norm_type,
                activation=self.activation, use_spect=self.use_spect,
                name=f"decoder{i}",
            )(out, train, update_stats)

        return Output(
            self.output_nc, 3, norm_type="none", activation=self.activation,
            use_spect=self.use_spect, use_coord=self.use_coord, name="outconv",
        )(out, train, update_stats)


class FaceFlowNet(nn.Module):
    """Single flow U-Net over cat(BP, P_prev, BP_prev, P_ref, BP_ref)
    emitting 4ch flow + 2ch mask split into previous/reference pairs
    (generator.py:508-585)."""

    ngf: int = 32
    img_f: int = 256
    encoder_layer: int = 5
    attn_layer: Sequence[int] = (1, 2)
    norm_type: str = "batch"
    activation: str = "ReLU"
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, bp, p_prev, bp_prev, p_ref, bp_ref,
                 train=True, update_stats=True):
        inputs = jnp.concatenate([bp, p_prev, bp_prev, p_ref, bp_ref], axis=-1)
        kw = dict(
            norm_type=self.norm_type, activation=self.activation,
            use_spect=self.use_spect, use_coord=self.use_coord,
        )
        out = EncoderBlock(self.ngf, name="block0", **kw)(
            inputs, train, update_stats
        )
        result = [out]
        for i in range(self.encoder_layer - 1):
            out = EncoderBlock(
                self.ngf * _mult(i + 1, self.ngf, self.img_f),
                name=f"encoder{i}", **kw,
            )(out, train, update_stats)
            result.append(out)

        decoder_layer = self.encoder_layer - min(self.attn_layer)
        flows, masks = [], []
        for i in range(decoder_layer):
            level = self.encoder_layer - i - 2
            nc = self.ngf * (_mult(level, self.ngf, self.img_f) if level >= 0 else 1)
            out = ResBlockDecoder(
                nc, nc, norm_type=self.norm_type, activation=self.activation,
                use_spect=self.use_spect, name=f"decoder{i}",
            )(out, train, update_stats)
            jump = Jump(
                nc, 3, norm_type="none", activation=self.activation,
                use_spect=self.use_spect, use_coord=self.use_coord,
                name=f"jump{i}",
            )(result[self.encoder_layer - i - 2], train, update_stats)
            out = out + jump
            if self.encoder_layer - i - 1 in self.attn_layer:
                flow = Conv2d(4, (3, 3), (1, 1), 1, name=f"output{i}")(out)
                mask = jax.nn.sigmoid(
                    Conv2d(2, (3, 3), (1, 1), 1, name=f"mask{i}")(out)
                )
                flows.append(flow[..., 0:2])   # previous
                flows.append(flow[..., 2:4])   # reference
                masks.append(mask[..., 0:1])
                masks.append(mask[..., 1:2])
        return flows, masks


class FaceGenerator(nn.Module):
    """Recurrent face animation generator (generator.py:388-426): per frame,
    encode previous (initially the reference) and reference sources, predict
    split flows with one FaceFlowNet, decode with FaceTargetNet, and feed the
    generated frame back as the next previous frame."""

    image_nc: int = 3
    structure_nc: int = 16
    output_nc: int = 3
    ngf: int = 64
    img_f: int = 1024
    layers: int = 6
    num_blocks: int = 2
    norm_type: str = "batch"
    activation: str = "ReLU"
    attn_layer: Sequence[int] = (1, 2)
    extractor_kz: Dict[str, int] = None
    use_spect: bool = False
    use_coord: bool = False

    def setup(self):
        common = dict(
            ngf=self.ngf, img_f=self.img_f, layers=self.layers,
            norm_type=self.norm_type, activation=self.activation,
            use_spect=self.use_spect, use_coord=self.use_coord,
        )
        self.source_previous = PoseSourceNet(name="source_previous", **common)
        self.source_reference = PoseSourceNet(name="source_reference", **common)
        self.target = FaceTargetNet(
            output_nc=self.output_nc, ngf=self.ngf, img_f=self.img_f,
            layers=self.layers, num_blocks=self.num_blocks,
            norm_type=self.norm_type, activation=self.activation,
            attn_layer=tuple(self.attn_layer), extractor_kz=self.extractor_kz,
            use_spect=self.use_spect, use_coord=self.use_coord, name="target",
        )
        self.flow_net = FaceFlowNet(
            ngf=32, img_f=256, encoder_layer=5,
            attn_layer=tuple(self.attn_layer), norm_type=self.norm_type,
            activation=self.activation, use_spect=self.use_spect,
            use_coord=self.use_coord, name="flow_net",
        )

    def __call__(self, bp_frames, p_reference, bp_reference,
                 p_previous=None, bp_previous=None,
                 train=True, update_stats=True, use_scan=True, remat=False):
        """bp_frames: (B, T, H, W, structure_nc). Returns
        (gen (B,T,H,W,3), flows [2·levels × (B,T,h,w,2)] interleaved
        [p,r] per level, masks same structure, previous frames (B,T,...))."""
        p_prev = p_reference if p_previous is None else p_previous
        bp_prev = bp_reference if bp_previous is None else bp_previous
        # the reference image is static: encode once outside the recurrence
        ref_features = self.source_reference(p_reference, train, update_stats)

        def frame_step(mdl, carry, bp):
            p_prev, bp_prev = carry
            prev_features = mdl.source_previous(p_prev, train, update_stats)
            flows, masks = mdl.flow_net(
                bp, p_prev, bp_prev, p_reference, bp_reference,
                train, update_stats,
            )
            img = mdl.target(
                bp, prev_features, ref_features, flows, masks,
                train, update_stats,
            )
            return (img, bp), (img, flows, masks, p_prev)

        return _scan_frames(self, frame_step, p_prev, bp_prev, bp_frames,
                            use_scan, remat=remat)


class DanceGenerator(nn.Module):
    """Recurrent person animation generator (generator.py:264-316): like
    FaceGenerator but with *two* PoseFlowNets (previous / reference) whose
    flow & mask lists interleave [p, r, p, r] into a shared FaceTargetNet."""

    image_nc: int = 3
    structure_nc: int = 18
    output_nc: int = 3
    ngf: int = 64
    img_f: int = 1024
    layers: int = 6
    num_blocks: int = 2
    norm_type: str = "batch"
    activation: str = "ReLU"
    attn_layer: Sequence[int] = (1, 2)
    extractor_kz: Dict[str, int] = None
    use_spect: bool = False
    use_coord: bool = False

    def setup(self):
        common = dict(
            ngf=self.ngf, img_f=self.img_f, layers=self.layers,
            norm_type=self.norm_type, activation=self.activation,
            use_spect=self.use_spect, use_coord=self.use_coord,
        )
        self.source_previous = PoseSourceNet(name="source_previous", **common)
        self.source_reference = PoseSourceNet(name="source_reference", **common)
        self.target = FaceTargetNet(
            output_nc=self.output_nc, ngf=self.ngf, img_f=self.img_f,
            layers=self.layers, num_blocks=self.num_blocks,
            norm_type=self.norm_type, activation=self.activation,
            attn_layer=tuple(self.attn_layer), extractor_kz=self.extractor_kz,
            use_spect=self.use_spect, use_coord=self.use_coord, name="target",
        )
        # flow nets fixed to instance norm + LeakyReLU (generator.py:275-282)
        flow_kw = dict(
            ngf=32, img_f=256, encoder_layer=5,
            attn_layer=tuple(self.attn_layer), norm_type="instance",
            activation="LeakyReLU", use_spect=self.use_spect,
            use_coord=self.use_coord,
        )
        self.flow_net_previous = PoseFlowNet(name="flow_net_previous", **flow_kw)
        self.flow_net_reference = PoseFlowNet(name="flow_net_reference", **flow_kw)

    def __call__(self, bp_frames, p_reference, bp_reference,
                 p_previous=None, bp_previous=None,
                 train=True, update_stats=True, use_scan=True, remat=False):
        p_prev = p_reference if p_previous is None else p_previous
        bp_prev = bp_reference if bp_previous is None else bp_previous
        # The reference re-encodes the (static) reference image every frame
        # (reference generator.py:299); hoisting it out of the recurrence is
        # numerically identical for the live instance-norm config and saves
        # n_frames× encoder compute.
        ref_features = self.source_reference(p_reference, train, update_stats)

        # The reference-stream flow net depends only on the STATIC reference
        # pair and the per-frame target skeleton (generator.py:301-303) — so
        # it needn't sit inside the serial recurrence at all. Run it ONCE
        # with the frame axis folded into batch: a (B·T)-batch conv pass
        # instead of T sequential B-batch passes (the scan serializes the
        # chip at batch 2; folding 6 frames in feeds the MXU 6× wider).
        # Instance-norm flow nets are per-sample: bit-identical fold.
        B, T = bp_frames.shape[:2]
        fold = lambda a: a.reshape((B * T,) + a.shape[2:])
        rep = lambda a: jnp.broadcast_to(
            a[:, None], (B, T) + a.shape[1:]).reshape((B * T,) + a.shape[1:])
        flows_r_flat, masks_r_flat = self.flow_net_reference(
            rep(p_reference), rep(bp_reference), fold(bp_frames),
            train, update_stats,
        )
        unfold = lambda a: a.reshape((B, T) + a.shape[1:])
        flows_r_bt = tuple(unfold(f) for f in flows_r_flat)
        masks_r_bt = tuple(unfold(m) for m in masks_r_flat)

        def frame_step(mdl, carry, x):
            bp, flows_r, masks_r = x
            p_prev, bp_prev = carry
            prev_features = mdl.source_previous(p_prev, train, update_stats)
            flows_p, masks_p = mdl.flow_net_previous(
                p_prev, bp_prev, bp, train, update_stats
            )
            flows, masks = [], []
            for j in range(len(flows_p)):
                flows += [flows_p[j], flows_r[j]]
                masks += [masks_p[j], masks_r[j]]
            img = mdl.target(
                bp, prev_features, ref_features, flows, masks,
                train, update_stats,
            )
            return (img, bp), (img, flows, masks, p_prev)

        return _scan_frames(self, frame_step, p_prev, bp_prev,
                            (bp_frames, flows_r_bt, masks_r_bt),
                            use_scan, remat=remat)


# ---------------------------------------------------------------------------
# ShapeNet novel-view synthesis generators
# ---------------------------------------------------------------------------

class ShapeNetFlowNet(nn.Module):
    """Flow net that encodes the source image only and fuses the tiled
    (source_B − target_B) viewpoint difference at the bottleneck via a
    ResBlock (generator.py:672-757)."""

    structure_nc: int = 18
    ngf: int = 32
    img_f: int = 256
    encoder_layer: int = 5
    attn_layer: Sequence[int] = (1, 2)
    norm_type: str = "batch"
    activation: str = "ReLU"
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, source, source_b, target_b, train=True, update_stats=True):
        """source_b/target_b: (B, 1, 1, structure_nc) one-hot-ish pose codes."""
        kw = dict(
            norm_type=self.norm_type, activation=self.activation,
            use_spect=self.use_spect, use_coord=self.use_coord,
        )
        out = EncoderBlock(self.ngf, name="block0", **kw)(
            source, train, update_stats
        )
        result = [out]
        for i in range(self.encoder_layer - 1):
            out = EncoderBlock(
                self.ngf * _mult(i + 1, self.ngf, self.img_f),
                name=f"encoder{i}", **kw,
            )(out, train, update_stats)
            result.append(out)

        # bottleneck viewpoint fusion (generator.py:751-757)
        bottleneck_nc = out.shape[-1]
        b_diff = source_b - target_b
        b_tiled = jnp.broadcast_to(
            b_diff, (out.shape[0], out.shape[1], out.shape[2], b_diff.shape[-1])
        )
        out = jnp.concatenate([out, b_tiled], axis=-1)
        out = ResBlocks(
            1, bottleneck_nc, None, norm_type=self.norm_type,
            activation=self.activation, use_spect=self.use_spect,
            use_coord=self.use_coord, name="cat",
        )(out, train, update_stats)

        decoder_layer = self.encoder_layer - min(self.attn_layer)
        flows, masks = [], []
        for i in range(decoder_layer):
            level = self.encoder_layer - i - 2
            nc = self.ngf * (_mult(level, self.ngf, self.img_f) if level >= 0 else 1)
            out = ResBlockDecoder(
                nc, nc, norm_type=self.norm_type, activation=self.activation,
                use_spect=self.use_spect, name=f"decoder{i}",
            )(out, train, update_stats)
            jump = Jump(
                nc, 3, norm_type="none", activation=self.activation,
                use_spect=self.use_spect, use_coord=self.use_coord,
                name=f"jump{i}",
            )(result[self.encoder_layer - i - 2], train, update_stats)
            out = out + jump
            if self.encoder_layer - i - 1 in self.attn_layer:
                flows.append(Conv2d(2, (3, 3), (1, 1), 1, name=f"output{i}")(out))
                masks.append(jax.nn.sigmoid(
                    Conv2d(1, (3, 3), (1, 1), 1, name=f"mask{i}")(out)
                ))
        return flows, masks


class ShapeNetTargetNet(nn.Module):
    """Target decoder seeded from the target pose code tiled 8×8 through two
    ResBlockDecoders instead of an encoder (generator.py:614-670)."""

    output_nc: int = 3
    ngf: int = 64
    img_f: int = 1024
    layers: int = 6
    num_blocks: int = 2
    norm_type: str = "batch"
    activation: str = "ReLU"
    attn_layer: Sequence[int] = (1, 2)
    extractor_kz: Dict[str, int] = None
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, target_b, source_feature, flow_fields, masks,
                 train=True, update_stats=True):
        # target_b: (B, 1, 1, structure_nc) → tile to 8×8 (generator.py:653)
        B = target_b.shape[0]
        tb = jnp.broadcast_to(target_b, (B, 8, 8, target_b.shape[-1]))
        kw = dict(
            norm_type=self.norm_type, activation=self.activation,
            use_spect=self.use_spect,
        )
        out = ResBlockDecoder(self.ngf, None, name="block0", **kw)(
            tb, train, update_stats
        )
        mult = _mult(self.layers - 1, self.ngf, self.img_f)
        out = ResBlockDecoder(self.ngf * mult, None, name="block1", **kw)(
            out, train, update_stats
        )

        counter = 0
        for i in range(self.layers):
            if self.layers - i in self.attn_layer:
                k = self.extractor_kz[str(self.layers - i)]
                out_attn = ExtractorAttn(
                    k, activation=self.activation, name=f"attn{i}"
                )(source_feature[i], out, flow_fields[counter])
                out = out * (1 - masks[counter]) + out_attn * masks[counter]
                counter += 1
            mult = _mult(self.layers - i - 2, self.ngf, self.img_f) \
                if i != self.layers - 1 else 1
            if self.num_blocks > 1:
                out = ResBlocks(
                    self.num_blocks - 1, norm_type=self.norm_type,
                    activation=self.activation, use_spect=self.use_spect,
                    use_coord=self.use_coord, name=f"decoder{i}_res",
                )(out, train, update_stats)
            out = ResBlockDecoder(
                self.ngf * mult, None, norm_type=self.norm_type,
                activation=self.activation, use_spect=self.use_spect,
                name=f"decoder{i}",
            )(out, train, update_stats)

        return Output(
            self.output_nc, 3, norm_type="none", activation=self.activation,
            use_spect=self.use_spect, use_coord=self.use_coord, name="outconv",
        )(out, train, update_stats)


class ShapeNetGenerator(nn.Module):
    """Novel-view synthesis generator (generator.py:590-611)."""

    image_nc: int = 3
    structure_nc: int = 18
    output_nc: int = 3
    ngf: int = 64
    img_f: int = 1024
    layers: int = 6
    num_blocks: int = 2
    norm_type: str = "batch"
    activation: str = "ReLU"
    attn_layer: Sequence[int] = (1, 2)
    extractor_kz: Dict[str, int] = None
    use_spect: bool = False
    use_coord: bool = False

    def setup(self):
        self.source = PoseSourceNet(
            self.ngf, self.img_f, self.layers, self.norm_type,
            self.activation, self.use_spect, self.use_coord, name="source",
        )
        self.target = ShapeNetTargetNet(
            output_nc=self.output_nc, ngf=self.ngf, img_f=self.img_f,
            layers=self.layers, num_blocks=self.num_blocks,
            norm_type=self.norm_type, activation=self.activation,
            attn_layer=tuple(self.attn_layer), extractor_kz=self.extractor_kz,
            use_spect=self.use_spect, use_coord=self.use_coord, name="target",
        )
        self.flow_net = ShapeNetFlowNet(
            structure_nc=self.structure_nc, ngf=32, img_f=256,
            encoder_layer=5, attn_layer=tuple(self.attn_layer),
            norm_type=self.norm_type, activation=self.activation,
            use_spect=self.use_spect, use_coord=self.use_coord,
            name="flow_net",
        )

    def __call__(self, source, source_b, target_b, train=True, update_stats=True):
        feature_list = self.source(source, train, update_stats)
        flow_fields, masks = self.flow_net(
            source, source_b, target_b, train, update_stats
        )
        img = self.target(
            target_b, feature_list, flow_fields, masks, train, update_stats
        )
        return img, flow_fields, masks


class ShapeNetFlowNetGenerator(nn.Module):
    """Stage-1 flow pretraining head for ShapeNet (generator.py:759-773)."""

    image_nc: int = 3
    structure_nc: int = 18
    ngf: int = 32
    img_f: int = 256
    encoder_layer: int = 5
    attn_layer: Sequence[int] = (1, 2)
    norm_type: str = "batch"
    activation: str = "ReLU"
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, source, source_b, target_b, train=True, update_stats=True):
        return ShapeNetFlowNet(
            structure_nc=self.structure_nc, ngf=self.ngf, img_f=self.img_f,
            encoder_layer=self.encoder_layer, attn_layer=tuple(self.attn_layer),
            norm_type=self.norm_type, activation=self.activation,
            use_spect=self.use_spect, use_coord=self.use_coord,
            name="flow_net",
        )(source, source_b, target_b, train, update_stats)
