"""Pure-torch functional oracle for the reference GFLA networks (test-only).

Re-derives the reference modules' *math* in NCHW torch, driven directly by a
reference-keyed ``state_dict`` — no nn.Module tree, no reference imports.
Used by tests/test_torch_parity.py to prove forward parity of the flax
networks under shared weights, and to exercise the torch→flax checkpoint
converter against exact reference key strings.

Semantics are cited per function against /root/reference (file:line). The
live pose config is norm='instance', activation='LeakyReLU'(0.1),
use_spect_g=False (reference model/pose_model.py:39-45,64-66), which is what
these oracles implement; discriminator oracles add torch-style spectral
normalization (train-mode single power iteration).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def act(x):
    """LeakyReLU(0.1) — reference base_function.py:203."""
    return F.leaky_relu(x, 0.1)


def instance_norm(x, sd, key):
    """InstanceNorm2d(affine=True), eps 1e-5 — base_function.py:180."""
    return F.instance_norm(
        x, weight=sd[f"{key}.weight"], bias=sd[f"{key}.bias"], eps=1e-5
    )


def conv(x, sd, key, stride=1, pad=0):
    return F.conv2d(
        x, sd[f"{key}.weight"], sd.get(f"{key}.bias"), stride=stride,
        padding=pad,
    )


def conv_t(x, sd, key):
    """ConvTranspose2d(k3, s2, p1, output_padding=1) — base_function.py:519."""
    return F.conv_transpose2d(
        x, sd[f"{key}.weight"], sd.get(f"{key}.bias"), stride=2, padding=1,
        output_padding=1,
    )


# ---------------------------------------------------------------------------
# torch spectral normalization (functional train-mode semantics)
# ---------------------------------------------------------------------------

def sn_iterate(w, u):
    """One torch-style power iteration (torch.nn.utils.spectral_norm
    compute_weight, training mode): returns (w/sigma, u_new, v)."""
    wm = w.reshape(w.shape[0], -1)
    v = F.normalize(wm.t() @ u, dim=0, eps=1e-12)
    u_new = F.normalize(wm @ v, dim=0, eps=1e-12)
    sigma = torch.dot(u_new, wm @ v)
    return w / sigma, u_new, v


def conv_sn(x, sd, key, stride=1, pad=0):
    """Spectral-normalized conv. Uses `{key}.weight_orig` / `{key}.weight_u`
    (torch spectral_norm state_dict layout) and updates u in-place, matching
    a training-mode forward."""
    w, u_new, _ = sn_iterate(sd[f"{key}.weight_orig"], sd[f"{key}.weight_u"])
    sd[f"{key}.weight_u"] = u_new
    return F.conv2d(x, w, sd.get(f"{key}.bias"), stride=stride, padding=pad)


def conv3d_sn(x, sd, key, stride, pad):
    w, u_new, _ = sn_iterate(sd[f"{key}.weight_orig"], sd[f"{key}.weight_u"])
    sd[f"{key}.weight_u"] = u_new
    return F.conv3d(x, w, sd.get(f"{key}.bias"), stride=stride, padding=pad)


# ---------------------------------------------------------------------------
# building blocks (base_function.py:334-556,650-691)
# ---------------------------------------------------------------------------

def encoder_block(x, sd, p, norm=True):
    """EncoderBlock (base_function.py:334-354): [IN, act, conv4s2p1, IN, act,
    conv3s1p1]; without norm the Sequential drops the norm slots."""
    if norm:
        x = act(instance_norm(x, sd, f"{p}.model.0"))
        x = conv(x, sd, f"{p}.model.2", stride=2, pad=1)
        x = act(instance_norm(x, sd, f"{p}.model.3"))
        return conv(x, sd, f"{p}.model.5", stride=1, pad=1)
    x = conv(act(x), sd, f"{p}.model.1", stride=2, pad=1)
    return conv(act(x), sd, f"{p}.model.3", stride=1, pad=1)


def resblock(x, sd, p, norm=True):
    """ResBlock (base_function.py:357-391); learnable shortcut iff the
    `{p}.shortcut.0.weight` key exists."""
    if norm:
        h = act(instance_norm(x, sd, f"{p}.model.0"))
        h = conv(h, sd, f"{p}.model.2", stride=1, pad=1)
        h = act(instance_norm(h, sd, f"{p}.model.3"))
        h = conv(h, sd, f"{p}.model.5", stride=1, pad=1)
    else:
        h = conv(act(x), sd, f"{p}.model.1", stride=1, pad=1)
        h = conv(act(h), sd, f"{p}.model.3", stride=1, pad=1)
    if f"{p}.shortcut.0.weight" in sd:
        return h + conv(x, sd, f"{p}.shortcut.0", stride=1, pad=0)
    return h + x


def resblock_decoder(x, sd, p, norm=True):
    """ResBlockDecoder (base_function.py:508-531): conv3s1p1 → convT 2×;
    shortcut convT 2×."""
    if norm:
        h = act(instance_norm(x, sd, f"{p}.model.0"))
        h = conv(h, sd, f"{p}.model.2", stride=1, pad=1)
        h = act(instance_norm(h, sd, f"{p}.model.3"))
        h = conv_t(h, sd, f"{p}.model.5")
    else:
        h = conv(act(x), sd, f"{p}.model.1", stride=1, pad=1)
        h = conv_t(act(h), sd, f"{p}.model.3")
    return h + conv_t(x, sd, f"{p}.shortcut.0")


def resblock_encoder_sn(x, sd, p):
    """ResBlockEncoder, norm='none' + spectral norm — the discriminator
    config (base_function.py:533-556, discriminator.py:31)."""
    h = conv_sn(act(x), sd, f"{p}.model.1", stride=1, pad=1)
    h = conv_sn(act(h), sd, f"{p}.model.3", stride=2, pad=1)
    s = F.avg_pool2d(x, 2, 2)
    return h + conv_sn(s, sd, f"{p}.shortcut.1", stride=1, pad=0)


def resblock3d_encoder_sn(x, sd, p):
    """ResBlock3DEncoder, norm='none' + SN (base_function.py:43-67):
    conv3³ s1 p1 → conv(3,4,4) s(1,2,2) p(0,1,1); shortcut avgpool3d+conv1³."""
    h = conv3d_sn(act(x), sd, f"{p}.model.1", stride=1, pad=1)
    h = conv3d_sn(act(h), sd, f"{p}.model.3", stride=(1, 2, 2), pad=(0, 1, 1))
    s = F.avg_pool3d(x, (3, 2, 2), stride=(1, 2, 2))
    return h + conv3d_sn(s, sd, f"{p}.shortcut.1", stride=1, pad=0)


def jump(x, sd, p):
    """Jump (base_function.py:672-691): act → ReflectionPad(1) → conv k3 p0."""
    x = F.pad(act(x), (1, 1, 1, 1), mode="reflect")
    return conv(x, sd, f"{p}.conv1", stride=1, pad=0)


def output_block(x, sd, p):
    """Output (base_function.py:650-670): act → reflect pad → conv → tanh."""
    x = F.pad(act(x), (1, 1, 1, 1), mode="reflect")
    return torch.tanh(conv(x, sd, f"{p}.conv1", stride=1, pad=0))


# ---------------------------------------------------------------------------
# custom-op oracles (CUDA kernel semantics)
# ---------------------------------------------------------------------------

def block_extract_tiles(source, flow, k):
    """BlockExtractor (block_extractor_kernel.cu:52-84): per flow cell,
    bilinearly sample the k×k neighbourhood around (y+flow_y, x+flow_x) with
    edge-clamped taps. Output tile layout (B, C, k·Hf, k·Wf)."""
    B, C, Hs, Ws = source.shape
    _, _, Hf, Wf = flow.shape
    r = k // 2
    dt = source.dtype
    ys = torch.arange(Hf, dtype=dt).view(1, Hf, 1, 1, 1)
    xs = torch.arange(Wf, dtype=dt).view(1, 1, Wf, 1, 1)
    oi = (torch.arange(k, dtype=dt) - r).view(1, 1, 1, k, 1)
    oj = (torch.arange(k, dtype=dt) - r).view(1, 1, 1, 1, k)
    py = flow[:, 1].view(B, Hf, Wf, 1, 1) + ys + oi  # (B,Hf,Wf,k,k)
    px = flow[:, 0].view(B, Hf, Wf, 1, 1) + xs + oj
    fy, fx = torch.floor(py), torch.floor(px)
    wy, wx = py - fy, px - fx
    iy0, ix0 = fy.long(), fx.long()

    def tap(iy, ix):
        iy = iy.clamp(0, Hs - 1)
        ix = ix.clamp(0, Ws - 1)
        flat = (iy * Ws + ix).reshape(B, 1, -1).expand(B, C, -1)
        return source.reshape(B, C, -1).gather(2, flat).view(
            B, C, Hf, Wf, k, k
        )

    wy = wy.unsqueeze(1)
    wx = wx.unsqueeze(1)
    out = (
        (1 - wy) * (1 - wx) * tap(iy0, ix0)
        + (1 - wy) * wx * tap(iy0, ix0 + 1)
        + wy * (1 - wx) * tap(iy0 + 1, ix0)
        + wy * wx * tap(iy0 + 1, ix0 + 1)
    )
    # (B,C,Hf,Wf,k,k) → (B,C,k·Hf,k·Wf)
    return out.permute(0, 1, 2, 4, 3, 5).reshape(B, C, Hf * k, Wf * k)


def attn_reshape(x, k):
    """LocalAttnReshape (local_attn_reshape_kernel.cu:52-58):
    (B, k², H, W) → (B, 1, kH, kW), out(y,x) = in[(y%k)·k + x%k, y//k, x//k]."""
    B, _, H, W = x.shape
    t = x.view(B, k, k, H, W).permute(0, 3, 1, 4, 2)
    return t.reshape(B, 1, H * k, W * k)


def extractor_attn(source, target, flow, sd, p, k):
    """ExtractorAttn with softmax=True (base_function.py:790-810; every live
    call site passes softmax=True, generator.py:112,469,472,646)."""
    bs = block_extract_tiles(source, flow, k)
    bt = block_extract_tiles(target, torch.zeros_like(flow), k)
    h = F.conv2d(
        torch.cat([bt, bs], 1),
        sd[f"{p}.fully_connect_layer.0.weight"],
        sd[f"{p}.fully_connect_layer.0.bias"],
        stride=k,
    )
    logits = F.conv2d(
        act(h),
        sd[f"{p}.fully_connect_layer.2.weight"],
        sd[f"{p}.fully_connect_layer.2.bias"],
    )
    attn = attn_reshape(torch.softmax(logits, dim=1), k)
    return F.avg_pool2d(attn * bs, k, k)


def bilinear_warp(source, flow):
    """The correctness loss's bilinear path (external_function.py:309-319):
    grid_sample with torch-1.0 semantics (align_corners=True), flow scaled
    2/w and 2/h in normalized coords."""
    b, c, h, w = source.shape
    dt = source.dtype
    x = torch.arange(w, dtype=dt).view(1, -1).expand(h, -1) / (w - 1)
    y = torch.arange(h, dtype=dt).view(-1, 1).expand(-1, w) / (h - 1)
    grid = torch.stack([x, y], dim=0).unsqueeze(0).expand(b, -1, -1, -1)
    grid = 2 * grid - 1
    scale = torch.tensor([w, h], dtype=dt).view(1, 2, 1, 1)
    grid = (grid + 2 * flow / scale).permute(0, 2, 3, 1)
    return F.grid_sample(source, grid, align_corners=True).reshape(b, c, -1)


# ---------------------------------------------------------------------------
# losses (external_function.py)
# ---------------------------------------------------------------------------

def adversarial_loss(outputs, is_real, for_dis=None, gan_mode="lsgan"):
    """AdversarialLoss (external_function.py:82-119)."""
    if gan_mode == "hinge":
        if for_dis:
            if is_real:
                outputs = -outputs
            return F.relu(1 + outputs).mean()
        return (-outputs).mean()
    label = torch.full_like(outputs, 1.0 if is_real else 0.0)
    if gan_mode == "lsgan":
        return F.mse_loss(outputs, label)
    if gan_mode == "nsgan":
        return F.binary_cross_entropy(torch.sigmoid(outputs), label)
    raise ValueError(gan_mode)


VGG_CFG = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256),
    "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512),
    "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512),
]


def vgg19_features(x, sd):
    """VGG19 relu taps (external_function.py:323-444), standard slicing —
    matching gfla_tpu.models.vgg (the reference's relu3_2/3_3 slicing bug is
    dead code for every live loss)."""
    feats = {}
    for item in VGG_CFG:
        if item == "M":
            x = F.max_pool2d(x, 2, 2)
            continue
        name, _ = item
        x = F.relu(F.conv2d(x, sd[f"vgg.{name}.weight"],
                            sd[f"vgg.{name}.bias"], padding=1))
        feats["relu" + name[4:]] = x
    return feats


def gram(x):
    b, ch, h, w = x.shape
    f = x.reshape(b, ch, w * h)
    return f.bmm(f.transpose(1, 2)) / (h * w * ch)


def vgg_loss(x, y, sd):
    """VGGLoss content+style (external_function.py:121-160)."""
    fx, fy = vgg19_features(x, sd), vgg19_features(y, sd)
    content = sum(
        F.l1_loss(fx[n], fy[n])
        for n in ["relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"]
    )
    style = sum(
        F.l1_loss(gram(fx[n]), gram(fy[n]))
        for n in ["relu2_2", "relu3_4", "relu4_4", "relu5_2"]
    )
    return content, style


def perceptual_correctness_bilinear(target, source, flow_list, used_layers,
                                    sd, mask=None):
    """PerceptualCorrectness with use_bilinear_sampling=True
    (external_function.py:223-319)."""
    layers = ["relu1_1", "relu2_1", "relu3_1", "relu4_1"]
    used = sorted(used_layers, reverse=True)
    tf, sf = vgg19_features(target, sd), vgg19_features(source, sd)
    eps = 1e-8
    loss = 0.0
    for i, flow in enumerate(flow_list):
        t = tf[layers[used[i]]]
        s = sf[layers[used[i]]]
        b, c, h, w = t.shape
        flow = F.interpolate(flow, [h, w], mode="bilinear", align_corners=False)
        t_all = t.reshape(b, c, -1)
        s_all = s.reshape(b, c, -1).transpose(1, 2)
        s_norm = s_all / (s_all.norm(dim=2, keepdim=True) + eps)
        t_norm = t_all / (t_all.norm(dim=1, keepdim=True) + eps)
        cmax = torch.bmm(s_norm, t_norm).max(dim=1)[0]
        sampled = bilinear_warp(s, flow)
        cs = F.cosine_similarity(sampled, t_all)
        loss_map = torch.exp(-cs / (cmax + eps))
        if mask is None:
            loss = loss + loss_map.mean() - np.exp(-1.0)
        else:
            m = F.interpolate(mask, size=(h, w)).reshape(-1, h * w)
            loss_map = loss_map - np.exp(-1.0)
            loss = loss + (m * loss_map).sum() / (m.sum() + eps)
    return loss


def affine_regularization(flow, kz):
    """AffineRegularizationLoss (external_function.py:31-77): per-patch
    deviation of the flow-displaced grid from its best-fit affine map."""
    dt = flow.dtype
    temp = np.arange(kz)
    A = np.ones([kz * kz, 3])
    A[:, 0] = temp.repeat(kz)
    A[:, 1] = temp.repeat(kz).reshape((kz, kz)).transpose().reshape(kz**2)
    AH = A.transpose()
    kmat = np.dot(A, np.dot(np.linalg.inv(np.dot(AH, A)), AH)) - np.identity(
        kz**2
    )
    kernel = np.dot(kmat.transpose(), kmat)
    weights = torch.from_numpy(kernel).to(dt).view(kz**2, kz, kz).unsqueeze(1)

    b, _, h, w = flow.shape
    x = torch.arange(w, dtype=dt).view(1, -1).expand(h, -1)
    y = torch.arange(h, dtype=dt).view(-1, 1).expand(-1, w)
    grid = torch.stack([x, y], dim=0).unsqueeze(0).expand(b, -1, -1, -1)
    grid = flow + grid

    loss = 0.0
    for ch in range(2):
        g = grid[:, ch].unsqueeze(1)
        results = F.conv2d(g, weights)  # valid → (b, kz², h-kz+1, w-kz+1)
        hh, ww = results.shape[2], results.shape[3]
        kernels_new = attn_reshape(results, kz)
        f = torch.zeros(b, 2, hh, ww, dtype=dt) + float(int(kz / 2))
        grid_h = block_extract_tiles(g, f, kz)
        result = F.avg_pool2d(grid_h * kernels_new, kz, kz)
        loss = loss + result.mean() * kz**2
    return loss


# ---------------------------------------------------------------------------
# networks (generator.py / discriminator.py)
# ---------------------------------------------------------------------------

def pose_source_net(x, sd, prefix="source", layers=3):
    """PoseSourceNet (generator.py:40-70): reversed pyramid incl. input."""
    feats = [x]
    out = encoder_block(x, sd, f"{prefix}.block0")
    feats.append(out)
    for i in range(layers - 1):
        out = encoder_block(out, sd, f"{prefix}.encoder{i}")
        feats.append(out)
    return list(reversed(feats))


def pose_flow_net(source, source_b, target_b, sd, prefix="flow_net",
                  encoder_layer=5, attn_layer=(2, 3)):
    """PoseFlowNet (generator.py:170-242)."""
    out = encoder_block(torch.cat([source, source_b, target_b], 1), sd,
                        f"{prefix}.block0")
    result = [out]
    for i in range(encoder_layer - 1):
        out = encoder_block(out, sd, f"{prefix}.encoder{i}")
        result.append(out)
    flows, masks = [], []
    for i in range(encoder_layer - min(attn_layer)):
        out = resblock_decoder(out, sd, f"{prefix}.decoder{i}")
        out = out + jump(result[encoder_layer - i - 2], sd, f"{prefix}.jump{i}")
        if encoder_layer - i - 1 in attn_layer:
            flows.append(conv(out, sd, f"{prefix}.output{i}", 1, 1))
            masks.append(torch.sigmoid(conv(out, sd, f"{prefix}.mask{i}.0",
                                            1, 1)))
    return flows, masks


def pose_target_net(target_b, feats, flows, masks, sd, prefix="target",
                    layers=3, attn_layer=(2, 3), kz=None):
    """PoseTargetNet, num_blocks=2 (generator.py:73-137)."""
    kz = kz or {"3": 3, "2": 5}
    out = encoder_block(target_b, sd, f"{prefix}.block0")
    for i in range(layers - 1):
        out = encoder_block(out, sd, f"{prefix}.encoder{i}")
    counter = 0
    for i in range(layers):
        if layers - i in attn_layer:
            a = extractor_attn(feats[i], out, flows[counter], sd,
                               f"{prefix}.attn{i}", kz[str(layers - i)])
            out = out * (1 - masks[counter]) + a * masks[counter]
            counter += 1
        out = resblock(out, sd, f"{prefix}.decoder{i}.0.model.0")
        out = resblock_decoder(out, sd, f"{prefix}.decoder{i}.1")
    return output_block(out, sd, f"{prefix}.outconv")


def pose_generator(source, source_b, target_b, sd, layers=3,
                   attn_layer=(2, 3), kz=None):
    """PoseGenerator (generator.py:13-30), live fashion config."""
    feats = pose_source_net(source, sd, layers=layers)
    flows, masks = pose_flow_net(source, source_b, target_b, sd,
                                 attn_layer=attn_layer)
    img = pose_target_net(target_b, feats, flows, masks, sd, layers=layers,
                          attn_layer=attn_layer, kz=kz)
    return img, flows, masks


def res_discriminator(x, sd, layers=4):
    """ResDiscriminator (discriminator.py:10-47): SN everywhere, norm none."""
    out = resblock_encoder_sn(x, sd, "block0")
    for i in range(layers - 1):
        out = resblock_encoder_sn(out, sd, f"encoder{i}")
    w, u_new, _ = sn_iterate(sd["conv.weight_orig"], sd["conv.weight_u"])
    sd["conv.weight_u"] = u_new
    return F.conv2d(act(out), w, sd["conv.bias"])


def temporal_discriminator(x, sd, layers=4):
    """TemporalDiscriminator (discriminator.py:100-140). x: (B,C,T,H,W).
    After the two 3-D blocks, (b,c,l,h,w) folds to (b, c·l, h, w) — channel-
    major — before the 2-D encoders."""
    out = resblock3d_encoder_sn(x, sd, "block0")
    out = resblock3d_encoder_sn(out, sd, "block1")
    b, c, l, h, w = out.shape
    out = out.reshape(b, c * l, h, w)
    for i in range(layers - 2):
        out = resblock_encoder_sn(out, sd, f"encoder{i}")
    w_, u_new, _ = sn_iterate(sd["conv.weight_orig"], sd["conv.weight_u"])
    sd["conv.weight_u"] = u_new
    return F.conv2d(act(out), w_, sd["conv.bias"])


# ---------------------------------------------------------------------------
# reference-keyed state-dict builders
# ---------------------------------------------------------------------------

class SDBuilder:
    """Builds a state_dict with the reference's exact key strings, mirroring
    the module trees in generator.py / base_function.py."""

    def __init__(self, seed=0, dtype=torch.float64, scale=0.15):
        self.gen = torch.Generator().manual_seed(seed)
        self.dtype = dtype
        self.scale = scale
        self.sd = {}
        self.aliases = {}  # alias key -> canonical key (same tensor)

    def randn(self, *shape):
        return (
            torch.randn(*shape, generator=self.gen, dtype=torch.float64)
            * self.scale
        ).to(self.dtype)

    def add(self, key, *shape):
        self.sd[key] = self.randn(*shape)

    def norm(self, key, c):
        self.sd[f"{key}.weight"] = 1.0 + self.randn(c)
        self.sd[f"{key}.bias"] = self.randn(c)

    def conv(self, key, o, i, k, bias=True):
        self.add(f"{key}.weight", o, i, k, k)
        if bias:
            self.add(f"{key}.bias", o)

    def conv_sn(self, key, o, i, *kern, bias=True):
        """torch spectral_norm state_dict layout: weight_orig/weight_u/
        weight_v (no plain weight)."""
        self.add(f"{key}.weight_orig", o, i, *kern)
        u = torch.randn(o, generator=self.gen, dtype=torch.float64)
        self.sd[f"{key}.weight_u"] = F.normalize(u, dim=0).to(self.dtype)
        v = torch.randn(i * int(np.prod(kern)), generator=self.gen,
                        dtype=torch.float64)
        self.sd[f"{key}.weight_v"] = F.normalize(v, dim=0).to(self.dtype)
        if bias:
            self.add(f"{key}.bias", o)

    def convT(self, key, i, o, bias=True):
        """ConvTranspose2d weight layout (in, out, kh, kw)."""
        self.add(f"{key}.weight", i, o, 3, 3)
        if bias:
            self.add(f"{key}.bias", o)

    def encoder_block(self, p, i, o):
        self.norm(f"{p}.model.0", i)
        self.conv(f"{p}.model.2", o, i, 4)
        self.norm(f"{p}.model.3", o)
        self.conv(f"{p}.model.5", o, o, 3)

    def resblock(self, p, i, o=None, hidden=None):
        o = o or i
        hidden = hidden or i
        self.norm(f"{p}.model.0", i)
        self.conv(f"{p}.model.2", hidden, i, 3)
        self.norm(f"{p}.model.3", hidden)
        self.conv(f"{p}.model.5", o, hidden, 3)
        if i != o:
            self.conv(f"{p}.shortcut.0", o, i, 1)

    def resblock_decoder(self, p, i, o, hidden=None):
        hidden = hidden or i
        self.norm(f"{p}.model.0", i)
        self.conv(f"{p}.model.2", hidden, i, 3)
        self.norm(f"{p}.model.3", hidden)
        self.convT(f"{p}.model.5", hidden, o)
        self.convT(f"{p}.shortcut.0", i, o)

    def resblock_encoder_sn(self, p, i, o, hidden=None):
        hidden = hidden or i
        self.conv_sn(f"{p}.model.1", hidden, i, 3, 3)
        self.conv_sn(f"{p}.model.3", o, hidden, 4, 4)
        self.conv_sn(f"{p}.shortcut.1", o, i, 1, 1)

    def resblock3d_encoder_sn(self, p, i, o, hidden=None):
        hidden = hidden or i
        self.conv_sn(f"{p}.model.1", hidden, i, 3, 3, 3)
        self.conv_sn(f"{p}.model.3", o, hidden, 3, 4, 4)
        self.conv_sn(f"{p}.shortcut.1", o, i, 1, 1, 1)

    def jump(self, p, i, o):
        """Jump registers conv1 both as an attribute and inside `model`
        (base_function.py:682-688) — the state_dict carries both names."""
        self.conv(f"{p}.conv1", o, i, 3)
        self._alias(f"{p}.model.2", f"{p}.conv1")

    def output(self, p, i, o):
        self.conv(f"{p}.conv1", o, i, 3)
        self._alias(f"{p}.model.2", f"{p}.conv1")

    def _alias(self, alias, canon):
        for suffix in (".weight", ".bias"):
            self.sd[alias + suffix] = self.sd[canon + suffix]
            self.aliases[alias + suffix] = canon + suffix

    def attn(self, p, c, k):
        self.conv(f"{p}.fully_connect_layer.0", 128, 2 * c, k)
        self.conv(f"{p}.fully_connect_layer.2", k * k, 128, 1)

    def flow_head(self, p, i, nc):
        self.conv(f"{p}.output{i}", 2, nc, 3)
        self.conv(f"{p}.mask{i}.0", 1, nc, 3)


def _mult(i, ngf, img_f):
    return min(2**i, img_f // ngf)


def build_pose_generator_sd(seed=0, dtype=torch.float64, image_nc=3,
                            structure_nc=18, ngf=64, img_f=512, layers=3,
                            attn_layer=(2, 3), kz=None):
    """state_dict with the exact key strings a reference PoseGenerator
    checkpoint contains (live fashion config: pose_model.py:64-66)."""
    kz = kz or {"3": 3, "2": 5}
    b = SDBuilder(seed=seed, dtype=dtype)

    # --- source encoder (generator.py:40-57)
    b.encoder_block("source.block0", image_nc, ngf)
    mult = 1
    for i in range(layers - 1):
        mult_prev, mult = mult, _mult(i + 1, ngf, img_f)
        b.encoder_block(f"source.encoder{i}", ngf * mult_prev, ngf * mult)

    # --- flow U-Net, fixed ngf=32/img_f=256/encoder_layer=5 (generator.py:21-23)
    fngf, fimg_f, enc = 32, 256, 5
    b.encoder_block("flow_net.block0", 2 * structure_nc + image_nc, fngf)
    mult = 1
    for i in range(enc - 1):
        mult_prev, mult = mult, _mult(i + 1, fngf, fimg_f)
        b.encoder_block(f"flow_net.encoder{i}", fngf * mult_prev, fngf * mult)
    for i in range(enc - min(attn_layer)):
        mult_prev = mult
        mult = _mult(enc - i - 2, fngf, fimg_f) if i != enc - 1 else 1
        b.resblock_decoder(f"flow_net.decoder{i}", fngf * mult_prev,
                           fngf * mult, fngf * mult)
        b.jump(f"flow_net.jump{i}", fngf * mult, fngf * mult)
        if enc - i - 1 in attn_layer:
            b.flow_head("flow_net", i, fngf * mult)

    # --- target decoder (generator.py:73-115), num_blocks=2
    b.encoder_block("target.block0", structure_nc, ngf)
    mult = 1
    for i in range(layers - 1):
        mult_prev, mult = mult, _mult(i + 1, ngf, img_f)
        b.encoder_block(f"target.encoder{i}", ngf * mult_prev, ngf * mult)
    mult = _mult(layers - 1, ngf, img_f)
    for i in range(layers):
        mult_prev = mult
        mult = _mult(layers - i - 2, ngf, img_f) if i != layers - 1 else 1
        if layers - i in attn_layer:
            b.attn(f"target.attn{i}", ngf * mult_prev, kz[str(layers - i)])
        b.resblock(f"target.decoder{i}.0.model.0", ngf * mult_prev)
        b.resblock_decoder(f"target.decoder{i}.1", ngf * mult_prev, ngf * mult)
    b.output("target.outconv", ngf, image_nc)
    return b.sd, b.aliases


def build_res_discriminator_sd(seed=0, dtype=torch.float64, input_nc=3,
                               ndf=32, img_f=128, layers=4):
    """ResDiscriminator state_dict (discriminator.py:20-39); fashion D is
    ndf=32, img_f=128, layers=4 (pose_model.py:68-69)."""
    b = SDBuilder(seed=seed, dtype=dtype)
    b.resblock_encoder_sn("block0", input_nc, ndf, ndf)
    mult = 1
    for i in range(layers - 1):
        mult_prev, mult = mult, _mult(i + 1, ndf, img_f)
        b.resblock_encoder_sn(f"encoder{i}", ndf * mult_prev, ndf * mult,
                              ndf * mult_prev)
    b.conv_sn("conv", 1, ndf * mult, 1, 1)
    return b.sd


def build_temporal_discriminator_sd(seed=0, dtype=torch.float64, input_nc=3,
                                    input_length=6, ndf=32, img_f=128,
                                    layers=4):
    """TemporalDiscriminator state_dict (discriminator.py:106-128)."""
    b = SDBuilder(seed=seed, dtype=dtype)
    b.resblock3d_encoder_sn("block0", input_nc, ndf, ndf)
    b.resblock3d_encoder_sn("block1", ndf, 2 * ndf, ndf)
    mult = 2 * (input_length - 4)
    for i in range(layers - 2):
        mult_prev, mult = mult, _mult(i + 2, ndf, img_f)
        b.resblock_encoder_sn(f"encoder{i}", ndf * mult_prev, ndf * mult,
                              ndf * mult_prev)
    b.conv_sn("conv", 1, ndf * mult, 1, 1)
    return b.sd


def build_vgg_sd(seed=7, dtype=torch.float64):
    """Random VGG19 feature weights under the reference's `vgg.` prefix
    (fan-in-scaled so activations stay bounded through 16 conv layers)."""
    b = SDBuilder(seed=seed, dtype=dtype)
    prev = 3
    for item in VGG_CFG:
        if item == "M":
            continue
        name, ch = item
        b.scale = 1.2 / np.sqrt(9 * prev)
        b.conv(f"vgg.{name}", ch, prev, 3)
        prev = ch
    return b.sd


# ---------------------------------------------------------------------------
# face / dance (recurrent animation) networks
# ---------------------------------------------------------------------------

def face_flow_net(bp, p_prev, bp_prev, p_ref, bp_ref, sd, prefix="flow_net",
                  encoder_layer=5, attn_layer=(2, 3)):
    """FaceFlowNet (generator.py:508-585): one U-Net over
    cat(BP, P_prev, BP_prev, P_ref, BP_ref) emitting a 4ch flow + 2ch mask
    per attention level, split into [previous, reference] pairs."""
    inputs = torch.cat([bp, p_prev, bp_prev, p_ref, bp_ref], 1)
    out = encoder_block(inputs, sd, f"{prefix}.block0")
    result = [out]
    for i in range(encoder_layer - 1):
        out = encoder_block(out, sd, f"{prefix}.encoder{i}")
        result.append(out)
    flows, masks = [], []
    for i in range(encoder_layer - min(attn_layer)):
        out = resblock_decoder(out, sd, f"{prefix}.decoder{i}")
        out = out + jump(result[encoder_layer - i - 2], sd, f"{prefix}.jump{i}")
        if encoder_layer - i - 1 in attn_layer:
            flow = conv(out, sd, f"{prefix}.output{i}", 1, 1)
            mask = torch.sigmoid(conv(out, sd, f"{prefix}.mask{i}.0", 1, 1))
            flows += [flow[:, 0:2], flow[:, 2:4]]
            masks += [mask[:, 0:1], mask[:, 1:2]]
    return flows, masks


def face_target_net(bp, prev_feats, ref_feats, flows, masks, sd,
                    prefix="target", layers=3, attn_layer=(2, 3), kz=None):
    """FaceTargetNet, num_blocks=2 (generator.py:429-505): paired
    previous/reference attention, out = out_p + out_r."""
    kz = kz or {"3": 3, "2": 5}
    out = encoder_block(bp, sd, f"{prefix}.block0")
    for i in range(layers - 1):
        out = encoder_block(out, sd, f"{prefix}.encoder{i}")
    counter = 0
    for i in range(layers):
        if layers - i in attn_layer:
            k = kz[str(layers - i)]
            a_p = extractor_attn(prev_feats[i], out, flows[2 * counter], sd,
                                 f"{prefix}.attn_p{i}", k)
            a_r = extractor_attn(ref_feats[i], out, flows[2 * counter + 1],
                                 sd, f"{prefix}.attn_r{i}", k)
            out_p = out * (1 - masks[2 * counter]) + a_p * masks[2 * counter]
            out_r = out * (1 - masks[2 * counter + 1]) \
                + a_r * masks[2 * counter + 1]
            out = out_p + out_r
            counter += 1
        out = resblock(out, sd, f"{prefix}.decoder{i}.0.model.0")
        out = resblock_decoder(out, sd, f"{prefix}.decoder{i}.1")
    return output_block(out, sd, f"{prefix}.outconv")


def face_generator(bp_frames, p_ref, bp_ref, sd, layers=3, attn_layer=(2, 3),
                   kz=None, p_prev=None, bp_prev=None):
    """FaceGenerator frame loop (generator.py:402-426): generated frame
    feeds back as the next previous frame. bp_frames: (B, T, C, H, W).
    Returns (imgs list, flows list-per-frame, masks list-per-frame)."""
    p_prev = p_ref if p_prev is None else p_prev
    bp_prev = bp_ref if bp_prev is None else bp_prev
    gens, flows_all, masks_all = [], [], []
    for t in range(bp_frames.shape[1]):
        bp = bp_frames[:, t]
        prev_feats = pose_source_net(p_prev, sd, prefix="source_previous",
                                     layers=layers)
        ref_feats = pose_source_net(p_ref, sd, prefix="source_reference",
                                    layers=layers)
        flows, masks = face_flow_net(bp, p_prev, bp_prev, p_ref, bp_ref, sd,
                                     attn_layer=attn_layer)
        img = face_target_net(bp, prev_feats, ref_feats, flows, masks, sd,
                              layers=layers, attn_layer=attn_layer, kz=kz)
        gens.append(img)
        flows_all.append(flows)
        masks_all.append(masks)
        p_prev, bp_prev = img, bp
    return gens, flows_all, masks_all


def dance_generator(bp_frames, p_ref, bp_ref, sd, layers=3, attn_layer=(2, 3),
                    kz=None, p_prev=None, bp_prev=None):
    """DanceGenerator frame loop (generator.py:284-316): two PoseFlowNets
    (previous / reference) interleaving [p, r] per level into a shared
    FaceTargetNet."""
    p_prev = p_ref if p_prev is None else p_prev
    bp_prev = bp_ref if bp_prev is None else bp_prev
    gens, flows_all, masks_all = [], [], []
    for t in range(bp_frames.shape[1]):
        bp = bp_frames[:, t]
        prev_feats = pose_source_net(p_prev, sd, prefix="source_previous",
                                     layers=layers)
        ref_feats = pose_source_net(p_ref, sd, prefix="source_reference",
                                    layers=layers)
        flows_p, masks_p = pose_flow_net(p_prev, bp_prev, bp, sd,
                                         prefix="flow_net_previous",
                                         attn_layer=attn_layer)
        flows_r, masks_r = pose_flow_net(p_ref, bp_ref, bp, sd,
                                         prefix="flow_net_reference",
                                         attn_layer=attn_layer)
        flows, masks = [], []
        for j in range(len(flows_p)):
            flows += [flows_p[j], flows_r[j]]
            masks += [masks_p[j], masks_r[j]]
        img = face_target_net(bp, prev_feats, ref_feats, flows, masks, sd,
                              layers=layers, attn_layer=attn_layer, kz=kz)
        gens.append(img)
        flows_all.append(flows)
        masks_all.append(masks)
        p_prev, bp_prev = img, bp
    return gens, flows_all, masks_all


# ---------------------------------------------------------------------------
# shapenet (novel-view synthesis) networks
# ---------------------------------------------------------------------------

def shapenet_flow_net(source, source_b, target_b, sd, prefix="flow_net",
                      encoder_layer=5, attn_layer=(2, 3)):
    """ShapeNetFlowNet (generator.py:672-757): encodes the source image only;
    the tiled (source_B - target_B) viewpoint difference is fused at the
    bottleneck through a single learnable-shortcut ResBlock (`cat`)."""
    out = encoder_block(source, sd, f"{prefix}.block0")
    result = [out]
    for i in range(encoder_layer - 1):
        out = encoder_block(out, sd, f"{prefix}.encoder{i}")
        result.append(out)
    # encode_ShapeNet_bone (generator.py:750-757)
    b_diff = source_b - target_b  # (B, nc, 1, 1)
    _, _, w, h = out.shape
    out = torch.cat([out, b_diff.repeat(1, 1, w, h)], 1)
    out = resblock(out, sd, f"{prefix}.cat.model.0")
    flows, masks = [], []
    for i in range(encoder_layer - min(attn_layer)):
        out = resblock_decoder(out, sd, f"{prefix}.decoder{i}")
        out = out + jump(result[encoder_layer - i - 2], sd, f"{prefix}.jump{i}")
        if encoder_layer - i - 1 in attn_layer:
            flows.append(conv(out, sd, f"{prefix}.output{i}", 1, 1))
            masks.append(torch.sigmoid(conv(out, sd, f"{prefix}.mask{i}.0",
                                            1, 1)))
    return flows, masks


def shapenet_target_net(target_b, feats, flows, masks, sd, prefix="target",
                        layers=3, attn_layer=(2, 3), kz=None):
    """ShapeNetTargetNet, num_blocks=2 (generator.py:614-670): seeded from
    the target pose code tiled 8x8 through two ResBlockDecoders."""
    kz = kz or {"3": 3, "2": 5}
    out = resblock_decoder(target_b.repeat(1, 1, 8, 8), sd,
                           f"{prefix}.block0")
    out = resblock_decoder(out, sd, f"{prefix}.block1")
    counter = 0
    for i in range(layers):
        if layers - i in attn_layer:
            a = extractor_attn(feats[i], out, flows[counter], sd,
                               f"{prefix}.attn{i}", kz[str(layers - i)])
            out = out * (1 - masks[counter]) + a * masks[counter]
            counter += 1
        out = resblock(out, sd, f"{prefix}.decoder{i}.0.model.0")
        out = resblock_decoder(out, sd, f"{prefix}.decoder{i}.1")
    return output_block(out, sd, f"{prefix}.outconv")


def shapenet_generator(source, source_b, target_b, sd, layers=3,
                       attn_layer=(2, 3), kz=None):
    """ShapeNetGenerator (generator.py:590-611)."""
    feats = pose_source_net(source, sd, prefix="source", layers=layers)
    flows, masks = shapenet_flow_net(source, source_b, target_b, sd,
                                     attn_layer=attn_layer)
    img = shapenet_target_net(target_b, feats, flows, masks, sd,
                              layers=layers, attn_layer=attn_layer, kz=kz)
    return img, flows, masks


# ---------------------------------------------------------------------------
# reference-keyed builders for the animation / shapenet generators
# ---------------------------------------------------------------------------

def _build_source_sd(b, prefix, image_nc, ngf, img_f, layers):
    """PoseSourceNet subtree (generator.py:40-57)."""
    b.encoder_block(f"{prefix}.block0", image_nc, ngf)
    mult = 1
    for i in range(layers - 1):
        mult_prev, mult = mult, _mult(i + 1, ngf, img_f)
        b.encoder_block(f"{prefix}.encoder{i}", ngf * mult_prev, ngf * mult)


def _build_flow_unet_sd(b, prefix, input_nc, attn_layer, flow_ch=2,
                        mask_ch=1, fngf=32, fimg_f=256, enc=5,
                        skip_block0=False):
    """Flow U-Net subtree shared by Pose/Face/ShapeNet flow nets
    (generator.py:170-242,508-547,672-714). Returns the bottleneck mult."""
    if not skip_block0:
        b.encoder_block(f"{prefix}.block0", input_nc, fngf)
    mult = 1
    for i in range(enc - 1):
        mult_prev, mult = mult, _mult(i + 1, fngf, fimg_f)
        b.encoder_block(f"{prefix}.encoder{i}", fngf * mult_prev, fngf * mult)
    return mult


def _build_flow_decoder_sd(b, prefix, attn_layer, mult, flow_ch=2, mask_ch=1,
                           fngf=32, fimg_f=256, enc=5):
    for i in range(enc - min(attn_layer)):
        mult_prev = mult
        mult = _mult(enc - i - 2, fngf, fimg_f) if i != enc - 1 else 1
        b.resblock_decoder(f"{prefix}.decoder{i}", fngf * mult_prev,
                           fngf * mult, fngf * mult)
        b.jump(f"{prefix}.jump{i}", fngf * mult, fngf * mult)
        if enc - i - 1 in attn_layer:
            b.conv(f"{prefix}.output{i}", flow_ch, fngf * mult, 3)
            b.conv(f"{prefix}.mask{i}.0", mask_ch, fngf * mult, 3)


def _build_face_target_sd(b, prefix, structure_nc, image_nc, ngf, img_f,
                          layers, attn_layer, kz, paired_attn=True,
                          encoder_input=True):
    """FaceTargetNet / ShapeNetTargetNet subtree (generator.py:429-479,
    614-649). paired_attn: attn_p/attn_r vs single attn. encoder_input:
    EncoderBlock chain (face) vs 8x8-seed ResBlockDecoders (shapenet)."""
    if encoder_input:
        b.encoder_block(f"{prefix}.block0", structure_nc, ngf)
        mult = 1
        for i in range(layers - 1):
            mult_prev, mult = mult, _mult(i + 1, ngf, img_f)
            b.encoder_block(f"{prefix}.encoder{i}", ngf * mult_prev,
                            ngf * mult)
    else:
        mult = _mult(layers - 1, ngf, img_f)
        b.resblock_decoder(f"{prefix}.block0", structure_nc, ngf,
                           structure_nc)
        b.resblock_decoder(f"{prefix}.block1", ngf, ngf * mult, ngf)
    mult = _mult(layers - 1, ngf, img_f)
    for i in range(layers):
        mult_prev = mult
        mult = _mult(layers - i - 2, ngf, img_f) if i != layers - 1 else 1
        if layers - i in attn_layer:
            if paired_attn:
                b.attn(f"{prefix}.attn_p{i}", ngf * mult_prev,
                       kz[str(layers - i)])
                b.attn(f"{prefix}.attn_r{i}", ngf * mult_prev,
                       kz[str(layers - i)])
            else:
                b.attn(f"{prefix}.attn{i}", ngf * mult_prev,
                       kz[str(layers - i)])
        b.resblock(f"{prefix}.decoder{i}.0.model.0", ngf * mult_prev)
        b.resblock_decoder(f"{prefix}.decoder{i}.1", ngf * mult_prev,
                           ngf * mult)
    b.output(f"{prefix}.outconv", ngf, image_nc)


def build_face_generator_sd(seed=0, dtype=torch.float64, image_nc=3,
                            structure_nc=16, ngf=64, img_f=512, layers=3,
                            attn_layer=(2, 3), kz=None):
    """FaceGenerator state_dict (generator.py:388-399; live config
    face_model.py:78-80: ngf=64, img_f=512, instance norm)."""
    kz = kz or {"3": 3, "2": 5}
    b = SDBuilder(seed=seed, dtype=dtype)
    _build_source_sd(b, "source_previous", image_nc, ngf, img_f, layers)
    _build_source_sd(b, "source_reference", image_nc, ngf, img_f, layers)
    _build_face_target_sd(b, "target", structure_nc, image_nc, ngf, img_f,
                          layers, attn_layer, kz)
    mult = _build_flow_unet_sd(b, "flow_net",
                               3 * structure_nc + 2 * image_nc, attn_layer)
    _build_flow_decoder_sd(b, "flow_net", attn_layer, mult, flow_ch=4,
                           mask_ch=2)
    return b.sd, b.aliases


def build_dance_generator_sd(seed=0, dtype=torch.float64, image_nc=3,
                             structure_nc=18, ngf=64, img_f=512, layers=3,
                             attn_layer=(2, 3), kz=None):
    """DanceGenerator state_dict (generator.py:264-282; live config
    dance_model.py:77-79)."""
    kz = kz or {"3": 3, "2": 5}
    b = SDBuilder(seed=seed, dtype=dtype)
    _build_source_sd(b, "source_previous", image_nc, ngf, img_f, layers)
    _build_source_sd(b, "source_reference", image_nc, ngf, img_f, layers)
    _build_face_target_sd(b, "target", structure_nc, image_nc, ngf, img_f,
                          layers, attn_layer, kz)
    for prefix in ("flow_net_previous", "flow_net_reference"):
        mult = _build_flow_unet_sd(b, prefix,
                                   image_nc + 2 * structure_nc, attn_layer)
        _build_flow_decoder_sd(b, prefix, attn_layer, mult)
    return b.sd, b.aliases


def build_shapenet_generator_sd(seed=0, dtype=torch.float64, image_nc=3,
                                structure_nc=18, ngf=64, img_f=512, layers=3,
                                attn_layer=(2, 3), kz=None):
    """ShapeNetGenerator state_dict (generator.py:590-604)."""
    kz = kz or {"3": 3, "2": 5}
    b = SDBuilder(seed=seed, dtype=dtype)
    _build_source_sd(b, "source", image_nc, ngf, img_f, layers)
    _build_face_target_sd(b, "target", structure_nc, image_nc, ngf, img_f,
                          layers, attn_layer, kz, paired_attn=False,
                          encoder_input=False)
    fngf, fimg_f = 32, 256
    mult = _build_flow_unet_sd(b, "flow_net", image_nc, attn_layer)
    # bottleneck fusion block (generator.py:695): ResBlocks(1, nc+s, nc)
    # -> ResBlock(input=nc+s, output=nc, hidden=nc+s) with 1x1 shortcut
    nc = fngf * mult
    b.resblock("flow_net.cat.model.0", nc + structure_nc, nc,
               nc + structure_nc)
    _build_flow_decoder_sd(b, "flow_net", attn_layer, mult)
    return b.sd, b.aliases


# ---------------------------------------------------------------------------
# keypoint motion-extraction net (KPInputNet2D, generator.py:331-382)
# ---------------------------------------------------------------------------

def _layer_norm_all(x, sd, key):
    """LayerNorm1d (base_function.py:892-907): LN over all non-batch dims,
    per-channel (C, 1) affine expanded over time."""
    shape = x.shape[1:]
    return F.layer_norm(x, shape, sd[f"{key}.weight"].expand(shape),
                        sd[f"{key}.bias"].expand(shape))


def _adaln1d(x, feature, sd, p):
    """ADALN1d (base_function.py:910-934): param-free LN then per-channel
    (1+γ)·x + β from a pooled feature."""
    actv = F.relu(F.linear(feature, sd[f"{p}.mlp_shared.0.weight"],
                           sd[f"{p}.mlp_shared.0.bias"]))
    gamma = F.linear(actv, sd[f"{p}.mlp_gamma.weight"],
                     sd[f"{p}.mlp_gamma.bias"]).unsqueeze(2)
    beta = F.linear(actv, sd[f"{p}.mlp_beta.weight"],
                    sd[f"{p}.mlp_beta.bias"]).unsqueeze(2)
    return F.layer_norm(x, x.shape[1:]) * (1 + gamma) + beta


def kp_input_net(kp, sd, prefix="kp_input", layers=4, kernel_size=3):
    """KPInputNet2D forward (generator.py:367-382), eval mode (no dropout).
    kp: (B, 2K, T) NCT."""
    k = kernel_size
    lrelu = lambda v: F.leaky_relu(v, 0.1)
    f = lrelu(F.conv1d(kp, sd[f"{prefix}.feature_conv_1.weight"], stride=2))
    f = lrelu(F.conv1d(f, sd[f"{prefix}.feature_conv_2.weight"], stride=2))
    f = lrelu(F.conv1d(f, sd[f"{prefix}.feature_conv_3.weight"], stride=2))
    feature = torch.mean(f, 2)

    x = F.conv1d(kp, sd[f"{prefix}.expand_conv.weight"])
    x = lrelu(_layer_norm_all(x, sd, f"{prefix}.expand_ln"))
    dilation = k
    for i in range(layers - 1):
        pad = (k - 1) * dilation // 2
        res = x[:, :, pad : x.shape[2] - pad]
        h = F.conv1d(x, sd[f"{prefix}.layers_conv.{2 * i}.weight"],
                     dilation=dilation)
        h = lrelu(_adaln1d(h, feature, sd, f"{prefix}.layers_ln.{2 * i}"))
        h2 = F.conv1d(h, sd[f"{prefix}.layers_conv.{2 * i + 1}.weight"])
        h2 = lrelu(_adaln1d(h2, feature, sd,
                            f"{prefix}.layers_ln.{2 * i + 1}"))
        x = res + h2
        dilation *= k
    return F.conv1d(x, sd[f"{prefix}.shrink.weight"],
                    sd[f"{prefix}.shrink.bias"])


def build_kp_input_sd(seed=0, dtype=torch.float64, keypoint_nc=17,
                      channels=256, layers=4, kernel_size=3):
    """KPInput2DGenerator state_dict (module tree generator.py:320-328:
    everything under `kp_input.`)."""
    b = SDBuilder(seed=seed, dtype=dtype)
    p, C, K2 = "kp_input", channels, 2 * keypoint_nc
    b.add(f"{p}.expand_conv.weight", C, K2, kernel_size)
    b.sd[f"{p}.expand_ln.weight"] = 1.0 + b.randn(C, 1)
    b.add(f"{p}.expand_ln.bias", C, 1)
    b.add(f"{p}.shrink.weight", K2, C, 1)
    b.add(f"{p}.shrink.bias", K2)
    for j in range(2 * (layers - 1)):
        kk = kernel_size if j % 2 == 0 else 1
        b.add(f"{p}.layers_conv.{j}.weight", C, C, kk)
        b.add(f"{p}.layers_ln.{j}.mlp_shared.0.weight", 128, C)
        b.add(f"{p}.layers_ln.{j}.mlp_shared.0.bias", 128)
        for head in ("mlp_gamma", "mlp_beta"):
            b.add(f"{p}.layers_ln.{j}.{head}.weight", C, 128)
            b.add(f"{p}.layers_ln.{j}.{head}.bias", C)
    b.add(f"{p}.feature_conv_1.weight", C, K2, kernel_size)
    b.add(f"{p}.feature_conv_2.weight", C, C, kernel_size)
    b.add(f"{p}.feature_conv_3.weight", C, C, kernel_size)
    return b.sd, b.aliases
