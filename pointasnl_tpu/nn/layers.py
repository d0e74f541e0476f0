"""Base layers: the TPU-native equivalents of the reference's utils/tf_util.py.

Design notes (vs the TF1 reference):

- All the reference's convs are 1x1 (pointwise) — `conv1d`/`conv2d` with
  kernel [1]/[1,1] (utils/tf_util.py:52,120). A pointwise conv over the last
  axis IS a dense matmul; on TPU that is exactly an MXU-shaped contraction, so
  `PointConv` is Dense(+bias) -> BatchNorm -> activation with xavier init
  matching tf.contrib.layers.xavier_initializer (tf_util.py:41-44).
- BatchNorm momentum is *scheduled* in the reference — bn_decay is a tensor
  driven by an exponential schedule (train.py:105-113) and fed into
  tf.contrib.layers.batch_norm's `decay` (tf_util.py:512-533, epsilon 1e-3).
  `BatchNorm` therefore accepts `momentum` as a traced call argument rather
  than a static attribute. Under pjit with a batch-sharded input, the batch
  moments are computed over the *global* batch (XLA inserts the cross-device
  reduction), which gives synchronized BN across the data-parallel mesh for
  free.
- Dropout keeps the reference's keep_prob convention (tf_util.py:594-615).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

_bn_sync = threading.local()


def current_bn_sync_axis() -> Optional[str]:
    """The mesh axis name BatchNorm cross-reduces batch moments over, or None.

    Set via `bn_sync_axis(...)` while TRACING a shard_map body whose inputs
    are sharded on a named axis: inside shard_map, `jnp.mean` only sees the
    local shard, so without the pmean each device would normalize with its
    own shard's moments (unlike the pjit path, where XLA reduces over the
    global batch automatically — layers.py module docstring). Equal-size
    shards make pmean-of-shard-moments exactly the global moments.
    """
    return getattr(_bn_sync, "axis", None)


@contextlib.contextmanager
def bn_sync_axis(axis: Optional[str]):
    """Scoped sync-BN: BatchNorms traced inside reduce moments over `axis`.

    A tracing-time property (like nn.precision.compute_dtype): wrap the
    shard_map body's submodule applications, not the jitted call site.
    """
    prev = getattr(_bn_sync, "axis", None)
    _bn_sync.axis = axis
    try:
        yield
    finally:
        _bn_sync.axis = prev


class BatchNorm(nn.Module):
    """Batch normalization with a dynamically scheduled EMA momentum.

    Matches tf.contrib.layers.batch_norm with center=scale=True, epsilon=1e-3
    (tf_util.py:528-533): training uses batch moments and updates the moving
    stats as  moving = moving * momentum + batch * (1 - momentum);
    eval uses the moving stats.
    """

    epsilon: float = 1e-3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, *, training: bool, momentum=0.9) -> Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if training:
            reduce_axes = tuple(range(x.ndim - 1))
            # at-least-f32 moments: bf16 activations promote to f32; f64
            # inputs (x64 parity controls) keep f64 so moment rounding does
            # not floor the achievable cross-path agreement at f32 noise
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            mean = jnp.mean(xf, axis=reduce_axes)
            meansq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            sync_axis = current_bn_sync_axis()
            if sync_axis is not None and not self.is_initializing():
                # inside a shard_map over equal shards: pmean of per-shard
                # moments = global moments (sync-BN over the named axis)
                mean = jax.lax.pmean(mean, sync_axis)
                meansq = jax.lax.pmean(meansq, sync_axis)
            var = meansq - jnp.square(mean)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = ra_mean.value * m + mean * (1.0 - m)
                ra_var.value = ra_var.value * m + var * (1.0 - m)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class Dropout(nn.Module):
    """Dropout with the reference's keep_prob convention (tf_util.py:594)."""

    keep_prob: float = 0.5

    @nn.compact
    def __call__(self, x: Array, *, training: bool) -> Array:
        return nn.Dropout(rate=1.0 - self.keep_prob, deterministic=not training)(x)


class PointConv(nn.Module):
    """Pointwise (1x1) convolution: Dense + bias [+ BN] [+ activation].

    Equivalent of tf_util.conv1d/conv2d with kernel size 1 (tf_util.py:52,120):
    xavier-uniform kernel, zero bias, optional scheduled-momentum BN, default
    ReLU. The kernel parameter is the analog of the reference's `weights`
    variables, which the models L2-regularize (models/pointasnl_cls.py:58).

    Deliberate deviation: the reference keeps a conv bias even when BN follows
    (tf_util.py:104-106) — that bias is cancelled by BN's mean subtraction, so
    its gradient is analytically zero (pure float noise, which Adam then
    amplifies to ±lr nondeterministically). We drop the bias when bn=True:
    the function computed is identical, and data-parallel training becomes
    bitwise-reproducible across mesh shapes.
    """

    features: int
    bn: bool = True
    activation: Optional[Callable[[Array], Array]] = nn.relu
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, *, training: bool, bn_momentum=0.9) -> Array:
        from pointasnl_tpu.nn import precision

        dtype = self.dtype if self.dtype is not None else precision.current_compute_dtype()
        x = nn.Dense(
            self.features,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            use_bias=not self.bn,
            dtype=dtype,
            name="conv",
        )(x)
        if self.bn:
            x = BatchNorm(dtype=dtype, name="bn")(
                x, training=training, momentum=bn_momentum
            )
        if self.activation is not None:
            x = self.activation(x)
        return x


class FullyConnected(nn.Module):
    """Dense + bias [+ BN] [+ activation] — tf_util.fully_connected (:327).

    Like PointConv, the bias is dropped when BN follows (see PointConv note).
    """

    features: int
    bn: bool = False
    activation: Optional[Callable[[Array], Array]] = nn.relu
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, *, training: bool, bn_momentum=0.9) -> Array:
        from pointasnl_tpu.nn import precision

        dtype = self.dtype if self.dtype is not None else precision.current_compute_dtype()
        x = nn.Dense(
            self.features,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            use_bias=not self.bn,
            dtype=dtype,
            name="dense",
        )(x)
        if self.bn:
            x = BatchNorm(dtype=dtype, name="bn")(
                x, training=training, momentum=bn_momentum
            )
        if self.activation is not None:
            x = self.activation(x)
        return x


class Conv2DTranspose(nn.Module):
    """Transposed 2D conv + optional BN/activation — tf_util.conv2d_transpose
    (:188; dead code in the reference models, provided for API parity)."""

    features: int
    kernel_size: tuple = (1, 1)
    strides: tuple = (1, 1)
    bn: bool = False
    activation: Optional[Callable[[Array], Array]] = nn.relu

    @nn.compact
    def __call__(self, x: Array, *, training: bool, bn_momentum=0.9) -> Array:
        x = nn.ConvTranspose(
            self.features,
            self.kernel_size,
            strides=self.strides,
            kernel_init=nn.initializers.xavier_uniform(),
            use_bias=not self.bn,
            name="conv",
        )(x)
        if self.bn:
            x = BatchNorm(name="bn")(x, training=training, momentum=bn_momentum)
        if self.activation is not None:
            x = self.activation(x)
        return x


class Conv3D(nn.Module):
    """3D conv + optional BN/activation — tf_util.conv3d (:268; API parity)."""

    features: int
    kernel_size: tuple = (1, 1, 1)
    strides: tuple = (1, 1, 1)
    bn: bool = False
    activation: Optional[Callable[[Array], Array]] = nn.relu

    @nn.compact
    def __call__(self, x: Array, *, training: bool, bn_momentum=0.9) -> Array:
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding="VALID",
            kernel_init=nn.initializers.xavier_uniform(),
            use_bias=not self.bn,
            name="conv",
        )(x)
        if self.bn:
            x = BatchNorm(name="bn")(x, training=training, momentum=bn_momentum)
        if self.activation is not None:
            x = self.activation(x)
        return x


def max_pool2d(x: Array, kernel_size, stride=None, padding="VALID") -> Array:
    """tf_util.max_pool2d (:366) — NHWC max pooling."""
    stride = stride or kernel_size
    return nn.max_pool(x, tuple(kernel_size), strides=tuple(stride), padding=padding)


def avg_pool2d(x: Array, kernel_size, stride=None, padding="VALID") -> Array:
    """tf_util.avg_pool2d (:399) — NHWC average pooling."""
    stride = stride or kernel_size
    return nn.avg_pool(x, tuple(kernel_size), strides=tuple(stride), padding=padding)


class MLP(nn.Module):
    """Stack of PointConvs (a per-point MLP); `last_activation` controls the tail."""

    features: tuple
    bn: bool = True
    activation: Optional[Callable[[Array], Array]] = nn.relu
    last_activation: Optional[Callable[[Array], Array]] = nn.relu
    last_bn: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, *, training: bool, bn_momentum=0.9) -> Array:
        n = len(self.features)
        for i, f in enumerate(self.features):
            last = i == n - 1
            x = PointConv(
                f,
                bn=self.last_bn if last else self.bn,
                activation=self.last_activation if last else self.activation,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x, training=training, bn_momentum=bn_momentum)
        return x
