"""Minimal PyTorch oracle models for golden parity tests.

These mirror the *math* of the reference V-JEPA modules (pre-LN ViT blocks
with fused QKV, tubelet Conv3d tokenizer, attentive pooler) using the same
parameter naming as reference checkpoints, so the jepa_tpu checkpoint
porter can consume their state_dicts directly. Written from the equations
— this is our independent numerical spec, not a copy.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class OracleBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0, eps=1e-6):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, hidden)
        self.mlp.fc2 = nn.Linear(hidden, dim)

    def _attention(self, x):
        B, N, C = x.shape
        h = self.heads
        qkv = self.attn.qkv(x).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = (C // h) ** -0.5
        w = (q @ k.transpose(-2, -1)) * scale
        w = w.softmax(dim=-1)
        out = (w @ v).transpose(1, 2).reshape(B, N, C)
        return self.attn.proj(out)

    def forward(self, x):
        x = x + self._attention(self.norm1(x))
        y = self.mlp.fc1(self.norm2(x))
        y = self.mlp.fc2(F.gelu(y))
        return x + y


class OracleViT(nn.Module):
    """Video ViT: Conv3d tubelet tokenizer + pos-embed + blocks + LN."""

    def __init__(self, img_size=32, patch=8, frames=4, tubelet=2, dim=64, depth=3, heads=4):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv3d(3, dim, kernel_size=(tubelet, patch, patch), stride=(tubelet, patch, patch))
        n = (frames // tubelet) * (img_size // patch) ** 2
        self.pos_embed = nn.Parameter(torch.zeros(1, n, dim), requires_grad=False)
        self.blocks = nn.ModuleList([OracleBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, keep_idx=None):
        # x: [B, C, T, H, W]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed
        if keep_idx is not None:
            idx = keep_idx.unsqueeze(-1).expand(-1, -1, x.shape[-1])
            x = torch.gather(x, 1, idx)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class OraclePredictor(nn.Module):
    """Narrow predictor over [ctxt || mask-token targets]."""

    def __init__(self, n_patches, dim_enc=64, dim=32, depth=2, heads=4, num_mask_tokens=2):
        super().__init__()
        self.predictor_embed = nn.Linear(dim_enc, dim)
        self.mask_tokens = nn.ParameterList(
            [nn.Parameter(torch.zeros(1, 1, dim)) for _ in range(num_mask_tokens)]
        )
        self.predictor_pos_embed = nn.Parameter(torch.zeros(1, n_patches, dim), requires_grad=False)
        self.predictor_blocks = nn.ModuleList([OracleBlock(dim, heads) for _ in range(depth)])
        self.predictor_norm = nn.LayerNorm(dim, eps=1e-6)
        self.predictor_proj = nn.Linear(dim, dim_enc)

    def forward(self, ctxt, idx_ctxt, idx_tgt, mask_index=0):
        B = ctxt.shape[0]
        x = self.predictor_embed(ctxt)
        pe = self.predictor_pos_embed.expand(B, -1, -1)
        gather = lambda t, idx: torch.gather(t, 1, idx.unsqueeze(-1).expand(-1, -1, t.shape[-1]))
        x = x + gather(pe, idx_ctxt)
        n_ctxt = x.shape[1]
        pred = self.mask_tokens[mask_index].expand(B, idx_tgt.shape[1], -1)
        pred = pred + gather(pe, idx_tgt)
        x = torch.cat([x, pred], dim=1)
        for blk in self.predictor_blocks:
            x = blk(x)
        x = self.predictor_norm(x)
        return self.predictor_proj(x[:, n_ctxt:])


class OracleAttentiveClassifier(nn.Module):
    def __init__(self, dim=64, heads=4, num_classes=10, eps=1e-5):
        super().__init__()
        self.pooler = nn.Module()
        self.pooler.query_tokens = nn.Parameter(torch.zeros(1, 1, dim))
        cab = nn.Module()
        cab.norm1 = nn.LayerNorm(dim, eps=eps)
        cab.xattn = nn.Module()
        cab.xattn.q = nn.Linear(dim, dim, bias=True)
        cab.xattn.kv = nn.Linear(dim, dim * 2, bias=True)
        cab.xattn.proj = nn.Linear(dim, dim)
        cab.norm2 = nn.LayerNorm(dim, eps=eps)
        cab.mlp = nn.Module()
        cab.mlp.fc1 = nn.Linear(dim, dim * 4)
        cab.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.pooler.cross_attention_block = cab
        self.linear = nn.Linear(dim, num_classes)
        self.heads = heads

    def forward(self, x):
        B, N, C = x.shape
        h = self.heads
        cab = self.pooler.cross_attention_block
        q = self.pooler.query_tokens.expand(B, -1, -1)
        xn = cab.norm1(x)
        qh = cab.xattn.q(q).reshape(B, 1, h, C // h).permute(0, 2, 1, 3)
        kv = cab.xattn.kv(xn).reshape(B, N, 2, h, C // h).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        w = (qh @ k.transpose(-2, -1)) * ((C // h) ** -0.5)
        w = w.softmax(dim=-1)
        out = (w @ v).transpose(1, 2).reshape(B, 1, C)
        # reference CrossAttention.forward returns WITHOUT applying proj
        # (modules.py:141-157: proj is defined at :137 but never called)
        q = q + out
        q = q + cab.mlp.fc2(F.gelu(cab.mlp.fc1(cab.norm2(q))))
        return self.linear(q.squeeze(1))


def randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model
