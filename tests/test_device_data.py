"""Device-resident input path: on-device epoch-index semantics and the
token-step bundle (runner.device_epoch_indices / make_device_data_step /
make_multistep).

The device data path replaces the host batcher with an HBM gather whose
indices derive on device from state.step — these tests pin the shuffle
contract (fresh permutation per epoch, disjoint batches within an epoch,
full coverage when batch_size divides N) and that a bundled lax.scan of K
steps equals K sequential dispatches of the same step."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tvqvae_tpu.train.runner import (
    device_epoch_indices,
    make_device_data_step,
    make_multistep,
)


def test_epoch_indices_partition_each_epoch():
    N, bs = 24, 6
    key = jax.random.key(3)
    spe = N // bs
    for epoch in range(3):
        seen = []
        for s in range(spe):
            step = epoch * spe + s
            idx = np.asarray(device_epoch_indices(key, jnp.int32(step), N, bs))
            assert idx.shape == (bs,)
            seen.append(idx)
        flat = np.concatenate(seen)
        # within one epoch: a permutation of [0, N)
        assert sorted(flat.tolist()) == list(range(N))
    # different epochs use different permutations
    e0 = np.asarray(device_epoch_indices(key, jnp.int32(0), N, bs))
    e1 = np.asarray(device_epoch_indices(key, jnp.int32(spe), N, bs))
    assert not np.array_equal(e0, e1)


def test_epoch_indices_drop_remainder():
    # N not divisible by bs: only spe = N // bs batches per epoch, all
    # in-range, no duplicates within the epoch
    N, bs = 25, 6
    key = jax.random.key(0)
    spe = N // bs
    flat = np.concatenate([
        np.asarray(device_epoch_indices(key, jnp.int32(s), N, bs))
        for s in range(spe)
    ])
    assert flat.min() >= 0 and flat.max() < N
    assert len(set(flat.tolist())) == len(flat)


def test_multistep_equals_sequential():
    """K-bundled scan of a stateful step == K sequential dispatches."""
    from flax import struct

    @struct.dataclass
    class S:
        w: jax.Array
        opt_state: object
        step: jax.Array

    tx = optax.sgd(0.1)
    N, bs, D = 12, 4, 5
    X = jnp.asarray(np.random.default_rng(0).normal(size=(N, D)), jnp.float32)

    def step_fn(state, xb, rng):
        def loss(w):
            return jnp.mean((xb @ w) ** 2)

        g = jax.grad(loss)(state.w)
        upd, opt_state = tx.update(g, state.opt_state, state.w)
        return (
            S(w=optax.apply_updates(state.w, upd), opt_state=opt_state,
              step=state.step + 1),
            {"loss": loss(state.w)},
        )

    from tvqvae_tpu.parallel import make_mesh

    mesh = make_mesh(1)
    dstep = make_device_data_step(step_fn, mesh, N, bs)
    w0 = jnp.asarray(np.random.default_rng(1).normal(size=(D,)), jnp.float32)
    mk = lambda: S(w=w0, opt_state=tx.init(w0), step=jnp.int32(0))
    dk, rng = jax.random.key(7), jax.random.key(8)

    single = jax.jit(dstep)
    sa = mk()
    losses = []
    for _ in range(6):
        sa, m = single(sa, (X,), dk, rng)
        losses.append(float(m["loss"]))

    bundled = jax.jit(make_multistep(dstep, 3))
    sb = mk()
    sb, m1 = bundled(sb, (X,), dk, rng)
    sb, m2 = bundled(sb, (X,), dk, rng)

    np.testing.assert_allclose(np.asarray(sa.w), np.asarray(sb.w),
                               rtol=1e-6, atol=1e-7)
    assert int(sb.step) == 6
    # bundle metrics are means over the scanned steps
    np.testing.assert_allclose(float(m1["loss"]), np.mean(losses[:3]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m2["loss"]), np.mean(losses[3:]),
                               rtol=1e-6)
