"""Gated convolutional (GLU) encoder (reference
``neural_sp/models/seq2seq/encoders/gated_conv.py:21-130``): a stack of
ConvGLUBlocks with residuals + a final FC-GLU; no time subsampling."""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..modules.glu import ConvGLUBlock, LinearGLUBlock


class GatedConvEncoder(nn.Module):
    """layers spec: '_'-separated 'channels:kernel', e.g. GCNN-like
    "100:3_100:3_100:3"."""
    input_dim: int
    layers: str = "100:3_100:3_100:3"
    dropout: float = 0.0
    last_proj_dim: int = 0
    bottleneck_dim: int = 0

    @property
    def _specs(self):
        out = []
        for tok in self.layers.split("_"):
            ch, k = tok.split(":")
            out.append((int(ch), int(k)))
        return out

    @property
    def subsampling_factor(self) -> int:
        return 1

    @property
    def output_dim(self) -> int:
        if self.last_proj_dim > 0:
            return self.last_proj_dim
        return self._specs[-1][0]

    @nn.compact
    def __call__(self, xs, xlens, task: str = "all",
                 deterministic: bool = True):
        h = xs
        in_ch = self.input_dim
        for i, (ch, k) in enumerate(self._specs):
            if in_ch != ch:
                h = nn.Dense(ch, name=f"resize{i}")(h)
                in_ch = ch
            h = ConvGLUBlock(kernel_size=k, in_ch=in_ch, out_ch=ch,
                             bottleneck_dim=self.bottleneck_dim,
                             dropout=self.dropout, causal=False,
                             name=f"glu{i}")(h, deterministic)
        h = LinearGLUBlock(self._specs[-1][0], name="fc_glu")(h)
        if self.last_proj_dim > 0:
            h = nn.Dense(self.last_proj_dim, name="bridge")(h)
        return {"ys": {"xs": h, "xlens": xlens}}
