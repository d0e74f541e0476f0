"""In-jit augmentations: jax.random variants of the provider pipeline.

The host numpy pipeline (data/provider.py) is the parity path; these jittable
equivalents let the augmentation fuse into the train step on-device (saving
host CPU + transfer when the host pipeline is the bottleneck). Each takes an
explicit PRNG key (SURVEY.md §7 randomness plumbing).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

Array = jax.Array


def _rot_y(angle: Array) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, z, s], -1), jnp.stack([z, o, z], -1), jnp.stack([-s, z, c], -1)], -2
    )


def _rot_z(angle: Array) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, s, z], -1), jnp.stack([-s, c, z], -1), jnp.stack([z, z, o], -1)], -2
    )


def rotate_point_cloud(key: Array, batch_data: Array) -> Array:
    """Per-cloud random up-axis (y) rotation."""
    angles = jax.random.uniform(key, (batch_data.shape[0],)) * 2 * jnp.pi
    return jnp.einsum("bnc,bcd->bnd", batch_data, _rot_y(angles))


def rotate_point_cloud_z(key: Array, batch_data: Array) -> Array:
    angles = jax.random.uniform(key, (batch_data.shape[0],)) * 2 * jnp.pi
    return jnp.einsum("bnc,bcd->bnd", batch_data, _rot_z(angles))


def rotate_perturbation_point_cloud(
    key: Array, batch_data: Array, angle_sigma=0.06, angle_clip=0.18
) -> Array:
    B = batch_data.shape[0]
    angles = jnp.clip(angle_sigma * jax.random.normal(key, (B, 3)), -angle_clip, angle_clip)
    cx, sx = jnp.cos(angles[:, 0]), jnp.sin(angles[:, 0])
    cy, sy = jnp.cos(angles[:, 1]), jnp.sin(angles[:, 1])
    cz, sz = jnp.cos(angles[:, 2]), jnp.sin(angles[:, 2])
    z = jnp.zeros(B)
    o = jnp.ones(B)
    Rx = jnp.stack(
        [jnp.stack([o, z, z], -1), jnp.stack([z, cx, -sx], -1), jnp.stack([z, sx, cx], -1)], -2
    )
    Ry = jnp.stack(
        [jnp.stack([cy, z, sy], -1), jnp.stack([z, o, z], -1), jnp.stack([-sy, z, cy], -1)], -2
    )
    Rz = jnp.stack(
        [jnp.stack([cz, -sz, z], -1), jnp.stack([sz, cz, z], -1), jnp.stack([z, z, o], -1)], -2
    )
    R = jnp.einsum("bij,bjk,bkl->bil", Rz, Ry, Rx)
    return jnp.einsum("bnc,bcd->bnd", batch_data, R)


def jitter_point_cloud(key: Array, batch_data: Array, sigma=0.01, clip=0.05) -> Array:
    noise = jnp.clip(sigma * jax.random.normal(key, batch_data.shape), -clip, clip)
    return batch_data + noise


def shift_point_cloud(key: Array, batch_data: Array, shift_range=0.1) -> Array:
    B = batch_data.shape[0]
    shifts = jax.random.uniform(key, (B, 1, 3), minval=-shift_range, maxval=shift_range)
    return batch_data + shifts


def random_scale_point_cloud(key: Array, batch_data: Array, scale_low=0.8, scale_high=1.25) -> Array:
    B = batch_data.shape[0]
    scales = jax.random.uniform(key, (B, 1, 1), minval=scale_low, maxval=scale_high)
    return batch_data * scales


def shuffle_points(key: Array, batch_data: Array) -> Array:
    """One shared permutation of the point axis (re-seeds on-device FPS)."""
    perm = jax.random.permutation(key, batch_data.shape[1])
    return batch_data[:, perm, :]


def random_point_dropout(key: Array, batch_data: Array, max_dropout_ratio=0.875) -> Array:
    """Collapse a random fraction of points onto the first point, per cloud."""
    B, N, _ = batch_data.shape
    k1, k2 = jax.random.split(key)
    ratios = jax.random.uniform(k1, (B, 1)) * max_dropout_ratio
    drop = jax.random.uniform(k2, (B, N)) <= ratios
    first = batch_data[:, :1, :]
    return jnp.where(drop[..., None], first, batch_data)


def augment_cls_batch(
    key: Array,
    batch_data: Array,
    *,
    rotation: bool = False,
    with_normal: bool = False,
) -> Array:
    """The ModelNet train-time pipeline (train.py:226-237) as one jit-able fn."""
    keys = jax.random.split(key, 6)
    xyz = batch_data[..., :3]
    rest = batch_data[..., 3:]
    if rotation:
        if with_normal:
            angles = jax.random.uniform(keys[0], (batch_data.shape[0],)) * 2 * jnp.pi
            R = _rot_y(angles)
            xyz = jnp.einsum("bnc,bcd->bnd", xyz, R)
            rest = jnp.einsum("bnc,bcd->bnd", rest, R)
            data = jnp.concatenate([xyz, rest], -1)
            data = rotate_perturbation_with_normal(keys[1], data)
            xyz, rest = data[..., :3], data[..., 3:]
        else:
            xyz = rotate_point_cloud(keys[0], xyz)
            xyz = rotate_perturbation_point_cloud(keys[1], xyz)
    xyz = random_scale_point_cloud(keys[2], xyz)
    xyz = shift_point_cloud(keys[3], xyz)
    data = jnp.concatenate([xyz, rest], -1) if rest.shape[-1] else xyz
    data = shuffle_points(keys[4], data)
    data = random_point_dropout(keys[5], data)
    return data


def rotate_perturbation_with_normal(key: Array, batch_data: Array, angle_sigma=0.06, angle_clip=0.18):
    B = batch_data.shape[0]
    angles = jnp.clip(angle_sigma * jax.random.normal(key, (B, 3)), -angle_clip, angle_clip)
    cx, sx = jnp.cos(angles[:, 0]), jnp.sin(angles[:, 0])
    cy, sy = jnp.cos(angles[:, 1]), jnp.sin(angles[:, 1])
    cz, sz = jnp.cos(angles[:, 2]), jnp.sin(angles[:, 2])
    z = jnp.zeros(B)
    o = jnp.ones(B)
    Rx = jnp.stack(
        [jnp.stack([o, z, z], -1), jnp.stack([z, cx, -sx], -1), jnp.stack([z, sx, cx], -1)], -2
    )
    Ry = jnp.stack(
        [jnp.stack([cy, z, sy], -1), jnp.stack([z, o, z], -1), jnp.stack([-sy, z, cy], -1)], -2
    )
    Rz = jnp.stack(
        [jnp.stack([cz, -sz, z], -1), jnp.stack([sz, cz, z], -1), jnp.stack([z, z, o], -1)], -2
    )
    R = jnp.einsum("bij,bjk,bkl->bil", Rz, Ry, Rx)
    out_xyz = jnp.einsum("bnc,bcd->bnd", batch_data[..., :3], R)
    out_nrm = jnp.einsum("bnc,bcd->bnd", batch_data[..., 3:6], R)
    return jnp.concatenate([out_xyz, out_nrm], -1)
