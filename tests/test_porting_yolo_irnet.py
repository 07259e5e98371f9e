"""Torch forward-parity for ``port_yolo`` and ``port_irnet``.

Round-1 verdict: the two *hardest* porting layouts — yolopt-style YOLOv11
(qkv-packed attention, DFL head, nc=1 surgery) and AdaFace IR-Net (C-major
flatten of the output linear, PReLU, SE) — had no numeric coverage. These
tests instantiate *randomly initialized* torch transcriptions of the public
reference architectures (reference: training/yolopt/nets/nn.py:28-347 and
libs/net_adaface.py:144-337 — neither torchvision-style package is installed
here), port their state dicts, and require the flax forwards to match torch
to fp32 tolerance. State-dict key names follow the reference modules exactly,
because those names ARE the porting interface.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prpe_tpu.models import porting  # noqa: E402
from prpe_tpu.nn.irnet import IRNet  # noqa: E402
from prpe_tpu.nn.yolo import YOLO, decode_predictions  # noqa: E402


# --------------------------------------------------------------------------
# torch transcription of the vendored yolopt YOLOv11-n
# (behavioral spec: training/yolopt/nets/nn.py; key names must match its
#  state dict — conv/norm pairs, net.p{1..5}.{i}, fpn.h{1..6}, head.box/cls)
# --------------------------------------------------------------------------


class TC(torch.nn.Module):
    """conv+BN(+SiLU) block; state-dict keys '<name>.conv.*', '<name>.norm.*'."""

    def __init__(self, i, o, k=1, s=1, p=0, g=1, act=True):
        super().__init__()
        self.conv = torch.nn.Conv2d(i, o, k, s, p, groups=g, bias=False)
        self.norm = torch.nn.BatchNorm2d(o, eps=0.001, momentum=0.03)
        self.act = torch.nn.SiLU() if act else torch.nn.Identity()

    def forward(self, x):
        return self.act(self.norm(self.conv(x)))


class TRes(torch.nn.Module):
    def __init__(self, ch, e=0.5):
        super().__init__()
        self.conv1 = TC(ch, int(ch * e), 3, p=1)
        self.conv2 = TC(int(ch * e), ch, 3, p=1)

    def forward(self, x):
        return x + self.conv2(self.conv1(x))


class TCSPM(torch.nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv1 = TC(i, o // 2)
        self.conv2 = TC(i, o // 2)
        self.conv3 = TC(o, o)
        self.res_m = torch.nn.Sequential(TRes(o // 2, 1.0), TRes(o // 2, 1.0))

    def forward(self, x):
        return self.conv3(torch.cat([self.res_m(self.conv1(x)), self.conv2(x)], 1))


class TCSP(torch.nn.Module):
    def __init__(self, i, o, n, csp_inner, r):
        super().__init__()
        c = o // r
        self.conv1 = TC(i, 2 * c)
        self.conv2 = TC((2 + n) * c, o)
        mk = (lambda: TCSPM(c, c)) if csp_inner else (lambda: TRes(c))
        self.res_m = torch.nn.ModuleList(mk() for _ in range(n))

    def forward(self, x):
        ys = list(self.conv1(x).chunk(2, 1))
        for m in self.res_m:
            ys.append(m(ys[-1]))
        return self.conv2(torch.cat(ys, 1))


class TSPP(torch.nn.Module):
    def __init__(self, ch, k=5):
        super().__init__()
        self.conv1 = TC(ch, ch // 2)
        self.conv2 = TC(ch * 2, ch)
        self.pool = torch.nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.conv1(x)
        a = self.pool(x)
        b = self.pool(a)
        return self.conv2(torch.cat([x, a, b, self.pool(b)], 1))


class TAttn(torch.nn.Module):
    """qkv-packed conv attention; keys qkv/conv1(pos)/conv2(proj)."""

    def __init__(self, ch, nh):
        super().__init__()
        self.nh, self.dh = nh, ch // nh
        self.dk = self.dh // 2
        self.qkv = TC(ch, ch + 2 * self.dk * nh, act=False)
        self.conv1 = TC(ch, ch, 3, p=1, g=ch, act=False)
        self.conv2 = TC(ch, ch, act=False)

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.qkv(x).view(b, self.nh, 2 * self.dk + self.dh, h * w)
        q, k, v = qkv.split([self.dk, self.dk, self.dh], dim=2)
        attn = torch.softmax(q.transpose(-2, -1) @ k * self.dk**-0.5, dim=-1)
        y = (v @ attn.transpose(-2, -1)).view(b, c, h, w)
        return self.conv2(y + self.conv1(v.reshape(b, c, h, w)))


class TPSABlock(torch.nn.Module):
    def __init__(self, ch, nh):
        super().__init__()
        self.conv1 = TAttn(ch, nh)
        self.conv2 = torch.nn.Sequential(TC(ch, ch * 2), TC(ch * 2, ch, act=False))

    def forward(self, x):
        x = x + self.conv1(x)
        return x + self.conv2(x)


class TPSA(torch.nn.Module):
    def __init__(self, ch, n):
        super().__init__()
        self.conv1 = TC(ch, ch)
        self.conv2 = TC(ch, ch)
        self.res_m = torch.nn.Sequential(
            *(TPSABlock(ch // 2, max(1, ch // 128)) for _ in range(n))
        )

    def forward(self, x):
        a, b = self.conv1(x).chunk(2, 1)
        return self.conv2(torch.cat([a, self.res_m(b)], 1))


class TDarkNet(torch.nn.Module):
    def __init__(self, w, d, c):
        super().__init__()
        self.p1 = torch.nn.Sequential(TC(w[0], w[1], 3, 2, 1))
        self.p2 = torch.nn.Sequential(
            TC(w[1], w[2], 3, 2, 1), TCSP(w[2], w[3], d[0], c[0], 4)
        )
        self.p3 = torch.nn.Sequential(
            TC(w[3], w[3], 3, 2, 1), TCSP(w[3], w[4], d[1], c[0], 4)
        )
        self.p4 = torch.nn.Sequential(
            TC(w[4], w[4], 3, 2, 1), TCSP(w[4], w[4], d[2], c[1], 2)
        )
        self.p5 = torch.nn.Sequential(
            TC(w[4], w[5], 3, 2, 1),
            TCSP(w[5], w[5], d[3], c[1], 2),
            TSPP(w[5]),
            TPSA(w[5], d[4]),
        )

    def forward(self, x):
        p3 = self.p3(self.p2(self.p1(x)))
        p4 = self.p4(p3)
        return p3, p4, self.p5(p4)


class TDarkFPN(torch.nn.Module):
    def __init__(self, w, d, c):
        super().__init__()
        self.up = torch.nn.Upsample(scale_factor=2)
        self.h1 = TCSP(w[4] + w[5], w[4], d[5], c[0], 2)
        self.h2 = TCSP(w[4] + w[4], w[3], d[5], c[0], 2)
        self.h3 = TC(w[3], w[3], 3, 2, 1)
        self.h4 = TCSP(w[3] + w[4], w[4], d[5], c[0], 2)
        self.h5 = TC(w[4], w[4], 3, 2, 1)
        self.h6 = TCSP(w[4] + w[5], w[5], d[5], c[1], 2)

    def forward(self, feats):
        p3, p4, p5 = feats
        p4 = self.h1(torch.cat([self.up(p5), p4], 1))
        p3 = self.h2(torch.cat([self.up(p4), p3], 1))
        p4 = self.h4(torch.cat([self.h3(p3), p4], 1))
        p5 = self.h6(torch.cat([self.h5(p4), p5], 1))
        return p3, p4, p5


class THead(torch.nn.Module):
    """Raw-maps-only head (the eval decode is tested via numpy below)."""

    def __init__(self, nc, filters, ch=16):
        super().__init__()
        box = max(64, filters[0] // 4)
        cls = max(80, filters[0], nc)
        self.box = torch.nn.ModuleList(
            torch.nn.Sequential(
                TC(f, box, 3, p=1), TC(box, box, 3, p=1),
                torch.nn.Conv2d(box, 4 * ch, 1),
            )
            for f in filters
        )
        self.cls = torch.nn.ModuleList(
            torch.nn.Sequential(
                TC(f, f, 3, p=1, g=f), TC(f, cls),
                TC(cls, cls, 3, p=1, g=cls), TC(cls, cls),
                torch.nn.Conv2d(cls, nc, 1),
            )
            for f in filters
        )

    def forward(self, feats):
        return [
            torch.cat([b(f), c(f)], 1) for f, b, c in zip(feats, self.box, self.cls)
        ]


class TYolo(torch.nn.Module):
    def __init__(self, nc=80, w=(3, 16, 32, 64, 128, 256),
                 d=(1, 1, 1, 1, 1, 1), c=(False, True)):
        super().__init__()
        self.net = TDarkNet(w, d, c)
        self.fpn = TDarkFPN(w, d, c)
        self.head = THead(nc, (w[3], w[4], w[5]))

    def forward(self, x):
        return self.head(list(self.fpn(self.net(x))))


def _randomize_bn(model, rng):
    """Non-trivial running stats so mean/var mix-ups can't hide; random
    PReLU slopes so alpha mix-ups can't hide behind the 0.25 default."""
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
                if m.affine:
                    m.weight.uniform_(0.8, 1.2)
                    m.bias.normal_(0, 0.05)
            if isinstance(m, torch.nn.PReLU):
                m.weight.uniform_(0.1, 0.4)


def _np_decode_reference(maps, nc, reg_max=16, strides=(8, 16, 32)):
    """Numpy transcription of the reference eval decode
    (training/yolopt/nets/nn.py:261-270 + util.py:85-96): DFL expectation,
    anchor +/- lt/rb, cxcywh * stride, sigmoid scores. maps: torch NCHW."""
    flat, anchors, strs = [], [], []
    for m, s in zip(maps, strides):
        b, no, h, w = m.shape
        flat.append(m.detach().numpy().reshape(b, no, h * w))
        gx, gy = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
        anchors.append(np.stack([gx, gy], -1).reshape(-1, 2))
        strs.append(np.full((h * w, 1), s, np.float32))
    x = np.concatenate(flat, 2)  # (B, no, A)
    anchors = np.concatenate(anchors).astype(np.float32)  # (A, 2)
    strs = np.concatenate(strs)
    box, cls = x[:, : 4 * reg_max], x[:, 4 * reg_max:]
    # DFL: (B, 4, reg_max, A) softmax over bins, expectation
    d = box.reshape(box.shape[0], 4, reg_max, -1)
    p = np.exp(d - d.max(axis=2, keepdims=True))
    p /= p.sum(axis=2, keepdims=True)
    dist = (p * np.arange(reg_max)[None, None, :, None]).sum(2)  # (B, 4, A)
    lt, rb = dist[:, :2], dist[:, 2:]
    a = anchors.T[None] - lt
    b2 = anchors.T[None] + rb
    boxes = np.concatenate([(a + b2) / 2, b2 - a], 1) * strs.T[None]
    scores = 1 / (1 + np.exp(-cls))
    return np.concatenate([boxes, scores], 1)  # (B, 4+nc, A)


@pytest.fixture(scope="module")
def yolo_pair():
    torch.manual_seed(0)
    tm = TYolo(nc=80)
    tm.eval()
    _randomize_bn(tm, None)
    variables = porting.port_yolo(tm.state_dict(), variant="n")
    return tm, variables


def test_port_yolo_raw_maps_parity(yolo_pair, rng):
    tm, variables = yolo_pair
    x = rng.normal(0, 1, size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = [m.numpy() for m in tm(torch.from_numpy(x))]

    model = YOLO(nc=80, variant="n")
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w, rtol=2e-3, atol=2e-3
        )


def test_port_yolo_eval_decode_parity(yolo_pair, rng):
    """Full eval path: flax raw maps -> decode_predictions must equal the
    reference decode applied to the torch raw maps."""
    tm, variables = yolo_pair
    x = rng.normal(0, 1, size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = _np_decode_reference(tm(torch.from_numpy(x)), nc=80)

    model = YOLO(nc=80, variant="n")
    maps = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(decode_predictions(maps, nc=80))  # (B, A, 4+nc)
    np.testing.assert_allclose(
        got.transpose(0, 2, 1), want, rtol=2e-3, atol=2e-3
    )


def test_port_yolo_nc1_surgery(yolo_pair, rng):
    """nc=80 -> nc=1 surgery (reference training/modify_models.py:156-180):
    drop the final cls conv, keep everything else. The box channels of the
    surgered nc=1 model must match the torch nc=80 model exactly (the box
    branch is independent of nc)."""
    tm, ported = yolo_pair
    ported = jax.tree_util.tree_map(lambda a: a, ported)  # shallow-safe copy
    ported = {
        "params": {**ported["params"], "head": dict(ported["params"]["head"])},
        "batch_stats": ported["batch_stats"],
    }
    for l in range(3):
        assert ported["params"]["head"].pop(f"cls{l}_out", None) is not None

    model1 = YOLO(nc=1, variant="n")
    x = rng.normal(0, 1, size=(1, 3, 64, 64)).astype(np.float32)
    fresh = model1.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
    merged = porting.merge_variables(jax.device_get(fresh), ported)

    # ported box-branch weights survive the merge; cls_out stays fresh nc=1
    np.testing.assert_array_equal(
        merged["params"]["head"]["box0_out"]["kernel"],
        ported["params"]["head"]["box0_out"]["kernel"],
    )
    assert merged["params"]["head"]["cls0_out"]["kernel"].shape[-1] == 1

    got = model1.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1)))
    with torch.no_grad():
        want = [m.numpy() for m in tm(torch.from_numpy(x))]
    for g, w in zip(got, want):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        assert g.shape[1] == 64 + 1
        np.testing.assert_allclose(g[:, :64], w[:, :64], rtol=2e-3, atol=2e-3)


# --------------------------------------------------------------------------
# torch transcription of the AdaFace IR-Net backbone
# (behavioral spec: libs/net_adaface.py:144-337; key names input_layer.{0,1,2},
#  body.{i}.shortcut_layer/res_layer, output_layer.{0,3,4})
# --------------------------------------------------------------------------


def _ir_block(in_ch, depth, stride, se):
    """torch BasicBlockIR(+SE) with the reference's child names."""
    blk = torch.nn.Module()
    if in_ch == depth:
        blk.shortcut_layer = torch.nn.MaxPool2d(1, stride)
    else:
        blk.shortcut_layer = torch.nn.Sequential(
            torch.nn.Conv2d(in_ch, depth, 1, stride, bias=False),
            torch.nn.BatchNorm2d(depth),
        )
    res = torch.nn.Sequential(
        torch.nn.BatchNorm2d(in_ch),
        torch.nn.Conv2d(in_ch, depth, 3, 1, 1, bias=False),
        torch.nn.BatchNorm2d(depth),
        torch.nn.PReLU(depth),
        torch.nn.Conv2d(depth, depth, 3, stride, 1, bias=False),
        torch.nn.BatchNorm2d(depth),
    )
    if se:
        se_mod = torch.nn.Module()
        se_mod.fc1 = torch.nn.Conv2d(depth, depth // 16, 1, bias=False)
        se_mod.fc2 = torch.nn.Conv2d(depth // 16, depth, 1, bias=False)
        se_mod.forward = lambda x, m=se_mod: x * torch.sigmoid(
            m.fc2(torch.relu(m.fc1(x.mean((2, 3), keepdim=True))))
        )
        res.add_module("se_block", se_mod)
    blk.res_layer = res
    blk.forward = lambda x, b=blk: b.res_layer(x) + b.shortcut_layer(x)
    return blk


class TIRNet(torch.nn.Module):
    _STAGES = {
        18: ((64, 2), (128, 2), (256, 2), (512, 2)),
        50: ((64, 3), (128, 4), (256, 14), (512, 3)),
    }

    def __init__(self, num_layers=50, se=False, in_ch=3):
        super().__init__()
        self.input_layer = torch.nn.Sequential(
            torch.nn.Conv2d(in_ch, 64, 3, 1, 1, bias=False),
            torch.nn.BatchNorm2d(64),
            torch.nn.PReLU(64),
        )
        blocks = []
        prev = 64
        for depth, n in self._STAGES[num_layers]:
            for u in range(n):
                blocks.append(_ir_block(prev, depth, 2 if u == 0 else 1, se))
                prev = depth
        self.body = torch.nn.Sequential(*blocks)
        self.output_layer = torch.nn.Sequential(
            torch.nn.BatchNorm2d(512),
            torch.nn.Dropout(0.4),
            torch.nn.Flatten(),
            torch.nn.Linear(512 * 7 * 7, 512),
            torch.nn.BatchNorm1d(512, affine=False),
        )

    def forward(self, x):
        x = self.output_layer(self.body(self.input_layer(x)))
        norm = torch.norm(x, 2, 1, True)
        return x / norm, norm


def _ir_parity(num_layers, mode, rng):
    torch.manual_seed(2)
    tm = TIRNet(num_layers=num_layers, se=(mode == "ir_se"))
    tm.eval()
    _randomize_bn(tm, None)

    variables = porting.port_irnet(tm.state_dict(), num_layers=num_layers, mode=mode)
    x = rng.normal(0, 1, size=(2, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        w_emb, w_norm = tm(torch.from_numpy(x))

    model = IRNet(num_layers=num_layers, mode=mode)
    emb, norm = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(emb), w_emb.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(norm), w_norm.numpy(), rtol=2e-3, atol=2e-3
    )


def test_port_ir50_forward_parity(rng):
    """IR-50 — the depth the real adaface_ir50_ms1mv2.ckpt uses. Covers the
    C-major output-linear flatten, PReLU alphas, MaxPool(1,s) shortcuts."""
    _ir_parity(50, "ir", rng)


def test_port_ir_se_18_forward_parity(rng):
    """IR-SE — exercises the SE fc1/fc2 port (smaller depth for speed)."""
    _ir_parity(18, "ir_se", rng)


def test_port_irnet_64ch_input_graft(rng):
    """The combined-model graft (reference training/modify_models.py:266-275):
    a fresh 64-channel input layer + pretrained body. Parity is end-to-end —
    we graft the SAME fresh 64-ch input layer onto the torch side."""
    torch.manual_seed(3)
    tm = TIRNet(num_layers=18, in_ch=64)  # 64-ch input conv, rest standard
    tm.eval()
    _randomize_bn(tm, None)

    variables = porting.port_irnet(tm.state_dict(), num_layers=18, mode="ir")
    assert variables["params"]["input_conv"]["kernel"].shape == (3, 3, 64, 64)

    x = rng.normal(0, 1, size=(2, 64, 112, 112)).astype(np.float32)
    with torch.no_grad():
        w_emb, w_norm = tm(torch.from_numpy(x))
    model = IRNet(num_layers=18, mode="ir", input_channels=64)
    emb, norm = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(emb), w_emb.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(norm), w_norm.numpy(), rtol=2e-3, atol=2e-3)


# --------------------------------------------------------------------------
# Whole-CombinedModel parity: torch transcription of the reference graft
# (training/modify_models.py:462-534) vs prpe_tpu.models.combined, same ported
# weights, same input -> same 4 branch outputs.
# --------------------------------------------------------------------------


def _seq_adapter(out_ch, size, act, final_3x3_ch):
    """torch adapter Sequential with the reference's child indices
    (modify_models.py:40-71 / :230-252 / :352-374)."""
    mk_act = {"silu": torch.nn.SiLU, "gelu": torch.nn.GELU,
              "prelu": None}[act]
    act_of = (lambda c: torch.nn.PReLU(c)) if act == "prelu" else (lambda c: mk_act())
    layers = [
        torch.nn.Conv2d(2048, 512, 1), torch.nn.BatchNorm2d(512), act_of(512),
        torch.nn.Upsample(size=size, mode="bilinear", align_corners=True),
    ]
    if act == "silu":  # yolo flavor has the extra 512->512 3x3 'spatial' conv
        layers += [torch.nn.Conv2d(512, 512, 3, padding=1),
                   torch.nn.BatchNorm2d(512), act_of(512)]
        chain = [(512, 256, 1), (256, 128, 3), (128, 64, 1), (64, 3, 3)]
    else:
        chain = [(512, 256, 3), (256, 128, 3), (128, final_3x3_ch, 3)]
    for i, o, k in chain:
        layers += [torch.nn.Conv2d(i, o, k, padding=k // 2),
                   torch.nn.BatchNorm2d(o), act_of(o)]
    return torch.nn.Sequential(*layers)


class _TTrunk(torch.nn.Module):
    """Reduced-depth torchvision-style ResNet trunk (state-dict keys match
    port_resnet50; bottleneck transcription imported from test_porting)."""

    def __init__(self, stages=(1, 1, 1, 1)):
        super().__init__()
        from test_porting import _TorchBottleneck

        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        in_ch, width = 64, 64
        for i, n in enumerate(stages):
            blocks = []
            for b in range(n):
                stride = 2 if (i > 0 and b == 0) else 1
                blocks.append(_TorchBottleneck(in_ch, width, stride))
                in_ch = width * 4
            setattr(self, f"layer{i + 1}", torch.nn.Sequential(*blocks))
            width *= 2

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class _TYoloBranch(torch.nn.Module):
    """CustomYOLO transcription: adapter -> standardize+sigmoid -> yolo
    (modify_models.py:35-96)."""

    def __init__(self, size):
        super().__init__()
        self.adapter = _seq_adapter(3, size, "silu", 3)
        self.yolo = TYolo(nc=1)

    def forward(self, f):
        x = self.adapter(f)
        x = x - x.mean(dim=(2, 3), keepdim=True)
        x = torch.sigmoid(x / (x.std(dim=(2, 3), keepdim=True) + 1e-6))
        return self.yolo(x)


class _TFaceBranch(torch.nn.Module):
    """CustomAdaFace transcription (modify_models.py:225-297): PReLU adapter,
    IR net with a 64-ch input layer, AdaFace head param/buffers."""

    def __init__(self, num_classes):
        super().__init__()
        self.adapter = _seq_adapter(64, (112, 112), "prelu", 64)
        self.adaface_model = TIRNet(num_layers=18, in_ch=64)
        head = torch.nn.Module()
        head.kernel = torch.nn.Parameter(torch.randn(512, num_classes))
        head.register_buffer("batch_mean", torch.ones(1) * 20)
        head.register_buffer("batch_std", torch.ones(1) * 100)
        self.head = head

    def forward(self, f):
        return self.adaface_model(self.adapter(f))


class _TPoseBranch(torch.nn.Module):
    """CustomVitPose transcription (modify_models.py:348-385)."""

    def __init__(self, size):
        super().__init__()
        from transformers import VitPoseConfig, VitPoseForPoseEstimation
        from transformers.models.vitpose_backbone import VitPoseBackboneConfig

        self.adapter = _seq_adapter(3, size, "gelu", 3)
        bc = VitPoseBackboneConfig(
            num_hidden_layers=2, hidden_size=32, num_attention_heads=2,
            intermediate_size=128, image_size=list(size), num_channels=3,
        )
        self.vit_pose = VitPoseForPoseEstimation(
            VitPoseConfig(backbone_config=bc, num_labels=17)
        )

    def forward(self, f):
        return self.vit_pose(pixel_values=self.adapter(f)).heatmaps


class _TCombined(torch.nn.Module):
    def __init__(self, det_size=(64, 64), pose_size=(64, 48), num_classes=40):
        super().__init__()
        self.backbone = _TTrunk()
        self.yolo_person = _TYoloBranch(det_size)
        self.yolo_face = _TYoloBranch(det_size)
        self.ada_face = _TFaceBranch(num_classes)
        self.vit_pose = _TPoseBranch(pose_size)


def test_port_combined_all_branches_parity(rng):
    from prpe_tpu.core.config import (
        AdaFaceConfig, CombinedModelConfig, DetectionConfig, PoseConfig,
    )
    from prpe_tpu.models.combined import CombinedModel

    torch.manual_seed(6)
    tm = _TCombined()
    tm.eval()
    _randomize_bn(tm, None)
    with torch.no_grad():
        tm.vit_pose.vit_pose.backbone.embeddings.position_embeddings.normal_(0, 0.02)

    cfg = CombinedModelConfig(
        image_size=128,
        backbone_stages=(1, 1, 1, 1),
        detection=DetectionConfig(adapter_size=(64, 64)),
        face=AdaFaceConfig(arch="ir_18", num_classes=40),
        pose=PoseConfig(
            input_size=(64, 48), heatmap_size=(16, 12),
            vit_hidden=32, vit_layers=2, vit_heads=2,
        ),
    )
    variables = porting.port_combined(
        tm.state_dict(), num_layers=18, backbone_stages=(1, 1, 1, 1)
    )
    model = CombinedModel(config=cfg)

    x = rng.normal(0, 0.5, size=(2, 3, 128, 128)).astype(np.float32)
    xt = torch.from_numpy(x)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))

    with torch.no_grad():
        feats = tm.backbone(xt)
        want_person = [m.numpy() for m in tm.yolo_person(feats)]
        want_face = [m.numpy() for m in tm.yolo_face(feats)]
        want_emb, want_norm = tm.ada_face(feats)
        want_hm = tm.vit_pose(feats).numpy()

    got_person = model.apply(variables, xj, "person", method="detect")
    got_face = model.apply(variables, xj, "face", method="detect")
    got_emb, got_norm = model.apply(variables, xj, method="embed_face")
    got_hm = model.apply(variables, xj, method="pose")

    for got, want in ((got_person, want_person), (got_face, want_face)):
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g).transpose(0, 3, 1, 2), w, rtol=5e-3, atol=5e-3
            )
    np.testing.assert_allclose(np.asarray(got_emb), want_emb.numpy(),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_norm), want_norm.numpy(),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_hm), want_hm, rtol=5e-3, atol=5e-3)


def test_port_irnet_skip_input_layer(rng):
    """skip_input_layer=True drops the pretrained input layer; merging onto a
    fresh 64-ch init keeps the fresh input conv and the ported body."""
    torch.manual_seed(4)
    tm = TIRNet(num_layers=18)
    tm.eval()
    ported = porting.port_irnet(tm.state_dict(), num_layers=18, skip_input_layer=True)
    assert "input_conv" not in ported["params"]

    model = IRNet(num_layers=18, mode="ir", input_channels=64)
    fresh = jax.device_get(model.init(jax.random.key(0), jnp.zeros((1, 112, 112, 64))))
    merged = porting.merge_variables(fresh, ported)
    assert merged["params"]["input_conv"]["kernel"].shape == (3, 3, 64, 64)
    np.testing.assert_array_equal(
        merged["params"]["body0"]["conv1"]["kernel"],
        ported["params"]["body0"]["conv1"]["kernel"],
    )
    emb, norm = model.apply(merged, jnp.zeros((1, 112, 112, 64)))
    assert np.isfinite(np.asarray(emb)).all()
