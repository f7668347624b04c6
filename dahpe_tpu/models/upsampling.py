"""Simple-Baseline deconvolution upsampling (stride-32 → stride-4 features).

TPU-native rebuild of ``uda/model/pose_resnet2.py:11-56``: three
[ConvTranspose2d(k=4, s=2, p=1, bias=False) → BN → ReLU] stages taking
``(B, 8, 8, 2048)`` to ``(B, 64, 64, 256)``. The transposed conv is expressed
as an input-dilated forward convolution (``lhs_dilation``) — the form XLA maps
directly onto the MXU — with torch-identical geometry.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dahpe_tpu.models.batch_norm import BatchNorm2d

head_init = nn.initializers.normal(stddev=1e-3)


class ConvTranspose2dTorch(nn.Module):
    """``torch.nn.ConvTranspose2d``-exact transposed convolution (NHWC).

    The kernel is stored in HWIO as the *equivalent forward-conv* kernel
    (spatially flipped relative to torch's ConvTranspose weight); the importer
    performs the flip. Output size: ``(H-1)*s - 2p + k + output_padding``.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = False
    dtype: Any = None
    kernel_init: Any = head_init

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, x.shape[-1], self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype
        pad = k - 1 - p
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=((pad, pad + op), (pad, pad + op)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            y = y + bias.astype(dtype)
        return y


class Upsampling(nn.Module):
    """3-stage deconv upsampler; submodules named by torch Sequential index.

    torch keys: ``upsampling.{0,3,6}.weight`` (deconvs), ``{1,4,7}`` (BNs).
    """

    hidden_dims: Sequence[int] = (256, 256, 256)
    kernel_sizes: Sequence[int] = (4, 4, 4)
    use_bias: bool = False
    dtype: Any = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        for i, (dim, k) in enumerate(zip(self.hidden_dims, self.kernel_sizes)):
            if k == 4:
                padding, output_padding = 1, 0
            elif k == 3:
                padding, output_padding = 1, 1
            elif k == 2:
                padding, output_padding = 0, 0
            else:
                raise NotImplementedError(f"kernel_size {k}")
            x = ConvTranspose2dTorch(
                features=dim,
                kernel_size=k,
                stride=2,
                padding=padding,
                output_padding=output_padding,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name=str(3 * i),
            )(x)
            x = BatchNorm2d(
                dtype=self.dtype, axis_name=self.bn_axis_name, name=str(3 * i + 1)
            )(x, train=train)
            x = nn.relu(x)
        return x
