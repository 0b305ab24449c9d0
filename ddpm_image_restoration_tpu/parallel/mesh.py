"""Device mesh + sharding layer — a NEW capability over the reference.

The reference is strictly single-device (torch.device at webp_training.py:18;
no torch.distributed anywhere — SURVEY.md C37). The TPU framework scales the
idiomatic JAX way: pick a Mesh, annotate shardings, let XLA insert the
collectives over ICI.

Layouts:
  * 'data' axis  — batch dimension of every array in the training batch.
                   Gradients reduce with an XLA all-reduce (psum) inserted
                   automatically by jit given replicated-param out-shardings.
  * 'model' axis — optional tensor parallelism: the output-channel dimension
                   of large conv kernels / dense layers (and matching biases
                   and optimizer moments) is sharded; activations stay
                   data-sharded, so XLA inserts all-gathers on the channel
                   axis only where a layer's input needs the full width.

Restoration at scale is embarrassingly parallel: shard the batch, run the
jitted sampler — no special code path needed beyond `batch_sharding`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Tuple[int, ...] = (-1,),
    axes: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh; one axis may be -1 (absorbs remaining devices)."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    mesh_devices = np.asarray(devices[:n]).reshape(shape)
    return Mesh(mesh_devices, axes)


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding for pytrees of [B, ...] arrays."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _kernel_spec(path_leaf: str, shape, model_size: int) -> P:
    """Partition spec for one parameter under tensor parallelism.

    Conv kernels are HWIO and Dense kernels are IO — shard the trailing
    (output-channel) axis when it divides the model-axis size; biases and
    scale vectors shard the same axis; everything else replicates.
    """
    if not shape:
        return P()
    last = shape[-1]
    if last % model_size == 0 and last >= 2 * model_size:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def _fsdp_spec(shape, spec: P, data_size: int) -> P:
    """Add 'data'-axis sharding to a param spec (FSDP / ZeRO-3 style): shard
    the largest still-unsharded axis that divides the data-axis size. XLA
    all-gathers the shard for compute and reduce-scatters the gradient —
    parameter and optimizer memory drop ~data_size-fold."""
    specs = list(spec) + [None] * (len(shape) - len(spec))
    for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if specs[i] is None and shape[i] % data_size == 0 and shape[i] >= 2 * data_size:
            specs[i] = "data"
            break
    return P(*specs)


def param_shardings(params, mesh: Mesh, fsdp: bool = False):
    """A pytree of NamedShardings for the params (and, by structure, any
    optimizer moments shaped like them). `fsdp` additionally shards each
    large param over the 'data' axis (see `_fsdp_spec`)."""
    msize = mesh.shape["model"] if "model" in mesh.axis_names else 0
    dsize = mesh.shape["data"] if fsdp and "data" in mesh.axis_names else 0

    def spec_for(x):
        spec = _kernel_spec("", x.shape, msize) if msize else P()
        if dsize > 1:
            spec = _fsdp_spec(x.shape, spec, dsize)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(spec_for, params)


def state_shardings(state, mesh: Mesh, fsdp: bool = False):
    """Shardings for a flax TrainState: params/opt-state follow
    param_shardings (optimizer moments mirror param shapes), scalars replicate."""
    p_sh = param_shardings(state.params, mesh, fsdp=fsdp)
    msize = mesh.shape["model"] if "model" in mesh.axis_names else 0
    dsize = mesh.shape["data"] if fsdp and "data" in mesh.axis_names else 0

    def assign(x):
        if not (hasattr(x, "shape") and x.ndim >= 1):
            return replicated(mesh)
        spec = _kernel_spec("", x.shape, msize) if msize else P()
        if dsize > 1:
            spec = _fsdp_spec(x.shape, spec, dsize)
        return NamedSharding(mesh, spec)

    extra = {}
    ema = getattr(state, "ema_params", None)
    if ema is not None:  # EMA mirrors the param shapes, shard identically
        extra["ema_params"] = param_shardings(ema, mesh, fsdp=fsdp)
    return state.replace(
        step=replicated(mesh),
        params=p_sh,
        opt_state=jax.tree_util.tree_map(assign, state.opt_state),
        **extra,
    )


def shard_train_step(train_step, mesh: Mesh, state, fsdp: bool = False):
    """Jit a train_step(state, batch, rng) over the mesh: batch data-sharded,
    state sharded per `state_shardings`, rng replicated. XLA inserts the
    gradient all-reduce over 'data' and any 'model'-axis collectives (with
    `fsdp`: param all-gathers + gradient reduce-scatters instead)."""
    st_sh = state_shardings(state, mesh, fsdp=fsdp)
    b_sh = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(st_sh, b_sh, replicated(mesh)),
        out_shardings=(st_sh, replicated(mesh)),
        donate_argnums=(0,),
    )


def put_batch(batch, mesh: Mesh):
    """Device-put a host batch with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_inference(params, y, mesh: Mesh):
    """Data-parallel restoration placement: params replicated over the mesh,
    observation batch y sharded on its leading axis. The jitted sampler then
    runs SPMD with zero extra code — restoration has no cross-sample
    communication, so DP scaling is linear up to batch size (the noise drawn
    inside the scan is sharding-invariant under JAX's partitionable
    threefry, so DP output == single-device output bit-for-bit given the
    same key — pinned by tests/test_parallel.py)."""
    params = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), params
    )
    return params, jax.device_put(y, batch_sharding(mesh))


def shard_inference_spatial(params, y, mesh: Mesh, axis: str = "spatial"):
    """Spatial-parallel restoration placement: params replicated, the image
    HEIGHT axis of NHWC `y` sharded over the mesh. This is the scale-out for
    the case data parallelism cannot touch — a batch too small for the device
    count (one giant image). XLA's SPMD partitioner runs each conv on its
    H-shard and inserts halo exchanges at shard edges over ICI; global ops
    (full-token attention, FFT phase consistency, blockwise DCT reshapes)
    gather as needed. Output is layout-invariant: sp restore == single-device
    restore (tests/test_parallel.py::test_sp_restore_matches_single_device)."""
    params = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), params
    )
    return params, jax.device_put(y, NamedSharding(mesh, P(None, axis)))


def put_state(state, mesh: Mesh, fsdp: bool = False):
    sh = state_shardings(state, mesh, fsdp=fsdp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, sh,
        is_leaf=lambda x: hasattr(x, "shape"),
    )
