"""Training loop and synthetic data generation (L4 of the stack).

Capability parity with /root/reference/aesmc/train.py:10-71: a `train`
driver over a dataloader with a per-iteration callback hook, parameter
handling across the four model components, and an infinite synthetic
dataset that regenerates from the generative model each iteration.

TPU-native architecture:
- components ARE the parameter pytree (flax struct dataclasses whose
  array fields are the trainable leaves), so the reference's nn.Module
  parameter discovery (`get_chained_params`,
  /root/reference/aesmc/train.py:10-19) reduces to "pass the tuple";
- one jitted `train_step` fuses loss, backward pass and the optax update
  into a single XLA program per iteration (the reference re-traces
  Python + autograd every step, /root/reference/aesmc/train.py:28-41);
- synthetic observations are generated on-device from PRNG keys (no host
  dataloader round trip; vs torch DataLoader machinery at
  /root/reference/aesmc/train.py:44-71);
- the callback contract `(epoch_idx, epoch_iteration_idx, loss, initial,
  transition, emission, proposal)` is preserved exactly
  (/root/reference/aesmc/train.py:39-41), with the updated component
  pytrees passed in (they are immutable, so the callback sees values, not
  mutable modules).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from . import losses, statistics

Components = tuple  # (initial, transition, emission, proposal)


def get_chained_params(*objects):
    """All trainable array leaves across the given component pytrees.

    JAX-native analogue of /root/reference/aesmc/train.py:10-19: since
    components are pytrees, their parameters are simply their leaves.
    Returns None if there are none (parity with the reference's behavior
    for all-non-module components).
    """
    leaves = []
    for obj in objects:
        if obj is not None:
            leaves.extend(jax.tree_util.tree_leaves(obj))
    return leaves or None


def make_train_step(num_particles: int, algorithm: str,
                    optimizer: optax.GradientTransformation,
                    resampling_method: str = "systematic",
                    resampling_implementation: str = "auto",
                    resampling_criterion="always",
                    remat: bool = False,
                    scan_unroll: int = 1,
                    nan_check: bool = False,
                    with_metrics: bool = False,
                    jit: bool = True,
                    **loss_kwargs) -> Callable:
    """Builds `(components, opt_state, observations, key) ->
    (components, opt_state, loss[, metrics])` - one fused optimization
    step (loss + backward pass + optax update in a single XLA program).

    `components` is the tuple (initial, transition, emission, proposal);
    None entries are allowed (e.g. no transition for T=1 models). With
    `with_metrics=True` the step also returns {'elbo', 'ess',
    'grad_norm'} (all device scalars; fetch them outside the hot loop).

    With `nan_check=True` the whole step is functionalized through
    `checkify`: a NaN in any resampling step's log-weights raises
    FloatingPointError on the host (parity with
    /root/reference/aesmc/inference.py:244-245, which this engine
    otherwise reproduces only eagerly) instead of silently corrupting
    the update. Costs one host sync per step.
    """

    def step(components, opt_state, observations, key):
        def loss_fn(components_):
            initial, transition, emission, proposal = components_
            if with_metrics:
                loss, metrics = losses.get_loss_and_metrics(
                    observations, num_particles, algorithm, initial,
                    transition, emission, proposal, key=key,
                    resampling_method=resampling_method,
                    resampling_implementation=resampling_implementation,
                    resampling_criterion=resampling_criterion, remat=remat,
                    scan_unroll=scan_unroll, nan_check=nan_check,
                    **loss_kwargs)
                return loss, metrics
            loss = losses.get_loss(
                observations, num_particles, algorithm, initial, transition,
                emission, proposal, key=key,
                resampling_method=resampling_method,
                resampling_implementation=resampling_implementation,
                resampling_criterion=resampling_criterion, remat=remat,
                scan_unroll=scan_unroll, nan_check=nan_check,
                **loss_kwargs)
            return loss, {}

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(components)
        updates, opt_state = optimizer.update(grads, opt_state, components)
        components = optax.apply_updates(components, updates)
        if with_metrics:
            metrics["grad_norm"] = optax.global_norm(grads)
            return components, opt_state, loss, metrics
        return components, opt_state, loss

    if nan_check:
        from jax.experimental import checkify
        checked = checkify.checkify(step, errors=checkify.user_checks)
        compiled = jax.jit(checked) if jit else checked

        def checked_step(components, opt_state, observations, key):
            err, out = compiled(components, opt_state, observations, key)
            msg = err.get()
            if msg is not None:
                raise FloatingPointError(msg)
            return out

        return checked_step

    # No buffer donation: callers may legitimately hold references to the
    # initial component pytrees (e.g. as the generative ground truth).
    return jax.jit(step) if jit else step


def train(dataloader: Iterable,
          num_particles: int,
          algorithm: str,
          initial,
          transition,
          emission,
          proposal,
          num_epochs: int,
          num_iterations_per_epoch: Optional[int] = None,
          optimizer: Optional[optax.GradientTransformation] = None,
          optimizer_kwargs: Optional[dict] = None,
          callback: Optional[Callable] = None,
          key=None,
          resampling_method: str = "systematic",
          resampling_implementation: str = "auto",
          resampling_criterion="always",
          remat: bool = False,
          checkpoint_dir=None,
          checkpoint_interval: Optional[int] = None,
          resume: bool = False) -> Components:
    """Trains the four components; returns the updated tuple.

    Signature parity with /root/reference/aesmc/train.py:22-41 (Adam
    default; `optimizer_kwargs` feed `optax.adam`, e.g.
    {'learning_rate': 0.01} - or pass any optax transformation via
    `optimizer`). The reference mutates modules in place and returns
    None; here the updated (initial, transition, emission, proposal)
    tuple is returned.
    """
    if optimizer is None:
        kwargs = dict(optimizer_kwargs or {})
        kwargs.setdefault("learning_rate", 1e-3)
        optimizer = optax.adam(**kwargs)
    if key is None:
        key = jax.random.PRNGKey(0)

    components = (initial, transition, emission, proposal)
    opt_state = optimizer.init(components)
    global_step = 0

    if checkpoint_dir is not None and resume:
        import pathlib

        from . import checkpoint as ckpt
        if pathlib.Path(checkpoint_dir).exists():
            template = ckpt.TrainState(components, opt_state, key, 0)
            state = ckpt.restore(checkpoint_dir, template)
            components, opt_state = state.components, state.opt_state
            key, global_step = state.key, state.step

    step = make_train_step(
        num_particles, algorithm, optimizer,
        resampling_method=resampling_method,
        resampling_implementation=resampling_implementation,
        resampling_criterion=resampling_criterion, remat=remat)

    def maybe_checkpoint(force=False):
        if checkpoint_dir is None:
            return
        due = checkpoint_interval is not None and \
            global_step % checkpoint_interval == 0 and global_step > 0
        if force or due:
            from . import checkpoint as ckpt
            ckpt.save(checkpoint_dir,
                      ckpt.TrainState(components, opt_state, key,
                                      global_step))

    for epoch_idx in range(num_epochs):
        for epoch_iteration_idx, observations in enumerate(dataloader):
            if num_iterations_per_epoch is not None and \
                    epoch_iteration_idx == num_iterations_per_epoch:
                break
            key, subkey = jax.random.split(key)
            components, opt_state, loss = step(
                components, opt_state, observations, subkey)
            global_step += 1

            if callback is not None:
                callback(epoch_idx, epoch_iteration_idx, loss, *components)
            maybe_checkpoint()

    maybe_checkpoint(force=checkpoint_dir is not None)
    return components


class SyntheticDataLoader:
    """Infinite iterable of on-device synthetic observations.

    Equivalent of the reference's `SyntheticDataset` + DataLoader
    (/root/reference/aesmc/train.py:44-71): each iteration yields a fresh
    stacked `[T, batch, ...]` observation pytree sampled from the
    generative model - generated by one jitted `sample_from_prior` call,
    never leaving the device. Also fixes the reference's dict-observation
    bug (`train.py:54` TODO): pytree observations pass through untouched.
    """

    def __init__(self, initial, transition, emission, num_timesteps: int,
                 batch_size: int, key=None):
        self.initial = initial
        self.transition = transition
        self.emission = emission
        self.num_timesteps = num_timesteps
        self.batch_size = batch_size
        self.key = key if key is not None else jax.random.PRNGKey(0)

        def sample(key):
            _, observations = statistics.sample_from_prior(
                initial, transition, emission, num_timesteps, batch_size,
                key)
            return observations

        self._sample = jax.jit(sample)

    def __iter__(self):
        while True:
            self.key, subkey = jax.random.split(self.key)
            yield self._sample(subkey)


def get_synthetic_dataloader(initial, transition, emission,
                             num_timesteps: int, batch_size: int,
                             key=None) -> SyntheticDataLoader:
    """Parity wrapper for /root/reference/aesmc/train.py:65-71."""
    return SyntheticDataLoader(initial, transition, emission, num_timesteps,
                               batch_size, key)


def train_on_device(initial, transition, emission, proposal,
                    num_particles: int, algorithm: str,
                    generative_components, num_timesteps: int,
                    batch_size: int, num_steps: int,
                    optimizer: Optional[optax.GradientTransformation] = None,
                    key=None, steps_per_call: int = 100,
                    resampling_method: str = "systematic",
                    resampling_implementation: str = "auto",
                    callback: Optional[Callable] = None):
    """Fully on-device training: synthetic data generation + train step
    fused into one `lax.scan`, `steps_per_call` iterations per dispatch.

    The reference round-trips the host every iteration (DataLoader +
    Python loop, /root/reference/aesmc/train.py:28-41); `train` keeps
    that granularity for callback parity. This variant eliminates
    per-iteration dispatch entirely - the right shape for TPU (and the
    sustained-throughput numbers bench.py reports).

    Args:
        generative_components: (initial, transition, emission) tuple the
            synthetic observations are drawn from.
        callback: called once per DISPATCH with
            (step_index, mean_loss_of_block, components).

    Returns:
        (components, losses `[num_steps]`).
    """
    if optimizer is None:
        optimizer = optax.adam(1e-3)
    if key is None:
        key = jax.random.PRNGKey(0)
    gen_initial, gen_transition, gen_emission = generative_components

    components = (initial, transition, emission, proposal)
    opt_state = optimizer.init(components)
    step = make_train_step(
        num_particles, algorithm, optimizer,
        resampling_method=resampling_method,
        resampling_implementation=resampling_implementation, jit=False)

    def body(carry, _):
        components, opt_state, key = carry
        key, k_data, k_step = jax.random.split(key, 3)
        _, observations = statistics.sample_from_prior(
            gen_initial, gen_transition, gen_emission, num_timesteps,
            batch_size, k_data)
        components, opt_state, loss = step(
            components, opt_state, observations, k_step)
        return (components, opt_state, key), loss

    # One compiled scan per distinct block length (at most two: the main
    # block and the tail), so exactly num_steps optimizer updates run and
    # the returned losses correspond 1:1 to the model returned.
    run_blocks = {}

    def run_block(length, components, opt_state, key):
        if length not in run_blocks:
            def run(components, opt_state, key):
                (components, opt_state, key), losses_block = jax.lax.scan(
                    body, (components, opt_state, key), None, length=length)
                return components, opt_state, key, losses_block
            run_blocks[length] = jax.jit(run)
        return run_blocks[length](components, opt_state, key)

    all_losses = []
    done = 0
    while done < num_steps:
        block = min(steps_per_call, num_steps - done)
        components, opt_state, key, losses_block = run_block(
            block, components, opt_state, key)
        done += block
        all_losses.append(losses_block)
        if callback is not None:
            callback(done, float(jnp.mean(losses_block)), components)

    return components, jnp.concatenate(all_losses)
