"""VQGAN decoder ground truth: a tiny torch implementation of the
taming-transformers decoder (the published architecture the reference's
offline img_gen decode uses, README.md:48) is built with random weights,
its state dict is converted, and the JAX decoder must reproduce the
torch forward exactly (layouts: OIHW->HWIO, NCHW->NHWC, GroupNorm eps,
nearest upsample, mid/level attention)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from unimp_tpu.tools.vqgan_decoder import VQGANDecoder, decode_img_gen_dump  # noqa: E402


def _norm(c):
    return nn.GroupNorm(num_groups=min(32, c), num_channels=c, eps=1e-6,
                        affine=True)


def _swish(x):
    return x * torch.sigmoid(x)


class ResnetBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _norm(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = _norm(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1, 1, 0)
        self.cin, self.cout = cin, cout

    def forward(self, x):
        h = self.conv1(_swish(self.norm1(x)))
        h = self.conv2(_swish(self.norm2(h)))
        if self.cin != self.cout:
            x = self.nin_shortcut(x)
        return x + h


class AttnBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = _norm(c)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, hh, ww = q.shape
        q = q.reshape(b, c, hh * ww).permute(0, 2, 1)
        k = k.reshape(b, c, hh * ww)
        att = torch.softmax(torch.bmm(q, k) * (c ** -0.5), dim=2)
        v = v.reshape(b, c, hh * ww)
        h = torch.bmm(v, att.permute(0, 2, 1)).reshape(b, c, hh, ww)
        return x + self.proj_out(h)


class Upsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, 1, 1)

    def forward(self, x):
        return self.conv(nn.functional.interpolate(x, scale_factor=2.0,
                                                   mode="nearest"))


class TinyTamingDecoder(nn.Module):
    """decoder half of taming's VQModel (ch=32, ch_mult=(1,2),
    num_res_blocks=1, attn at the lowest level)."""

    def __init__(self, n_embed=16, embed_dim=8, z_ch=8, ch=32,
                 ch_mult=(1, 2), num_res_blocks=1):
        super().__init__()
        self.quantize = nn.Module()
        self.quantize.embedding = nn.Embedding(n_embed, embed_dim)
        self.post_quant_conv = nn.Conv2d(embed_dim, z_ch, 1)
        self.decoder = nn.Module()
        d = self.decoder
        block_in = ch * ch_mult[-1]
        d.conv_in = nn.Conv2d(z_ch, block_in, 3, 1, 1)
        d.mid = nn.Module()
        d.mid.block_1 = ResnetBlock(block_in, block_in)
        d.mid.attn_1 = AttnBlock(block_in)
        d.mid.block_2 = ResnetBlock(block_in, block_in)
        d.up = nn.ModuleList()
        ups = []
        for i_level in reversed(range(len(ch_mult))):
            up = nn.Module()
            block_out = ch * ch_mult[i_level]
            blocks = nn.ModuleList()
            attns = nn.ModuleList()
            for _ in range(num_res_blocks + 1):
                blocks.append(ResnetBlock(block_in, block_out))
                block_in = block_out
                if i_level == len(ch_mult) - 1:  # attn at lowest level
                    attns.append(AttnBlock(block_in))
            up.block = blocks
            if attns:
                up.attn = attns
            if i_level != 0:
                up.upsample = Upsample(block_in)
            ups.insert(0, up)
        for u in ups:
            d.up.append(u)
        d.norm_out = _norm(block_in)
        d.conv_out = nn.Conv2d(block_in, 3, 3, 1, 1)
        self.ch_mult = ch_mult
        self.num_res_blocks = num_res_blocks

    def forward(self, codes):
        b, g = codes.shape
        gh = int(round(g ** 0.5))
        z = self.quantize.embedding(codes).reshape(b, gh, g // gh, -1)
        z = z.permute(0, 3, 1, 2)
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid.block_2(
            self.decoder.mid.attn_1(self.decoder.mid.block_1(h))
        )
        for i_level in reversed(range(len(self.ch_mult))):
            up = self.decoder.up[i_level]
            for j in range(self.num_res_blocks + 1):
                h = up.block[j](h)
                if hasattr(up, "attn"):
                    h = up.attn[j](h)
            if i_level != 0:
                h = up.upsample(h)
        h = self.decoder.conv_out(_swish(self.decoder.norm_out(h)))
        return h


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = TinyTamingDecoder().eval()
    dec = VQGANDecoder.from_state_dict(ref.state_dict())
    return ref, dec


def test_decoder_matches_torch_forward(pair):
    ref, dec = pair
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(2, 16))  # 4x4 grid -> 8x8 image
    with torch.no_grad():
        want = ref(torch.as_tensor(codes)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(dec._decode(codes.astype(np.int32)))
    assert got.shape == want.shape  # (2, 8, 8, 3)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    img = dec.decode(codes.astype(np.int32))
    assert img.dtype == np.uint8 and img.shape == (2, 8, 8, 3)


def test_architecture_inference(pair):
    _, dec = pair
    assert dec.num_levels == 2
    assert dec.blocks_per_level == {0: 2, 1: 2}
    assert dec.attn_levels == {1}
    assert (dec.n_embed, dec.embed_dim) == (16, 8)


def test_decode_img_gen_dump(tmp_path, pair):
    _, dec = pair
    import json

    dump = [
        {"generated": "img_1, img_2, img_3, img_4,", "target": "x"},
        {"generated": "no tokens here", "target": "y"},
        {"generated": "img_0, img_5, img_6,", "target": "z"},  # padded to 2x2
    ]
    p = tmp_path / "img_gen_0.json"
    p.write_text(json.dumps(dump))
    n = decode_img_gen_dump(str(p), dec, str(tmp_path / "out"))
    assert n == 2
    import os

    assert sorted(os.listdir(tmp_path / "out")) == ["gen_0.png", "gen_2.png"]
