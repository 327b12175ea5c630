"""Device mesh + sharding rules.

Mesh axes:
- ``data``: pure data parallelism (the reference's only strategy — DDP,
  reference: train.py:319). Batches shard on their leading axis; gradients
  are reduced by an XLA psum over ICI (the NCCL AllReduce analog,
  SURVEY.md §2.2).
- ``model``: tensor parallelism for the big frozen encoders and the vocab
  projection — attention heads and MLP hidden dims split column-wise then
  row-wise (Megatron layout), so each layer needs a single all-reduce that
  XLA inserts from the shardings.

Rules are expressed as (regex on the param path) -> PartitionSpec and
resolved once per tree; unmatched leaves replicate. The same rules drive both
``jax.device_put`` placement and pjit in_shardings.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` (auto-detected on
    TPU pods; explicit args for manual launches). The reference's analog is
    Lightning's hidden NCCL process-group init inside DDPStrategy
    (reference: train.py:319).

    No-op when already initialized, or when auto-detection finds no cluster
    (plain single-host run). A FAILED bring-up with explicit cluster args
    raises — degrading silently to single-host would train on 1/N of the
    data while reporting success."""
    import jax

    explicit = (coordinator_address is not None or num_processes is not None
                or process_id is not None)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise
    except ValueError:
        # Auto-detection found no cluster environment variables: normal for
        # single-host runs. With explicit args this is a misconfiguration.
        if explicit:
            raise


def make_mesh(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh. ``n_data=-1`` consumes all remaining
    devices. Lays the model axis innermost so TP collectives ride the
    fastest ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data == -1:
        if n % n_model:
            raise ValueError(f"{n} devices not divisible by model={n_model}")
        n_data = n // n_model
    if n_data * n_model != n:
        devices = devices[: n_data * n_model]
    grid = np.array(devices).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


# (path regex) -> PartitionSpec. Paths look like
# "whisper_encoder/layers/3/mlp/fc1/kernel".
DEFAULT_PARAM_RULES: tuple[tuple[str, P], ...] = (
    # Megatron-style TP for transformer blocks: column-parallel then
    # row-parallel.
    (r".*(self_attn|cross_attn|attn)/(q|k|v)/kernel$", P(None, MODEL_AXIS)),
    (r".*(self_attn|cross_attn|attn)/(q|k|v)/bias$", P(MODEL_AXIS)),
    (r".*(self_attn|cross_attn|attn)/out/kernel$", P(MODEL_AXIS, None)),
    (r".*(mlp/fc1|ff1)/kernel$", P(None, MODEL_AXIS)),
    (r".*(mlp/fc1|ff1)/bias$", P(MODEL_AXIS)),
    (r".*(mlp/fc2|ff2)/kernel$", P(MODEL_AXIS, None)),
    # Vocab-dim sharding for the big embedding / output head.
    (r".*embed_tokens/embedding$", P(MODEL_AXIS, None)),
    (r".*decoder/kernel$", P(None, MODEL_AXIS)),
    (r".*decoder/bias$", P(MODEL_AXIS)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_sharding(mesh: Mesh, params: Any,
                   rules: tuple[tuple[str, P], ...] = DEFAULT_PARAM_RULES) -> Any:
    """NamedSharding tree for a param pytree: first matching rule wins,
    otherwise replicated. Rules whose sharded dim doesn't divide evenly fall
    back to replication (e.g. head counts not divisible by the model axis)."""
    n_model = mesh.shape[MODEL_AXIS]

    def resolve(path, leaf):
        name = _path_str(path)
        for pattern, spec in rules:
            if re.match(pattern, name):
                # Drop mesh axes of extent 1 from the spec: sharding over a
                # trivial axis is physically replication, and GSPMD
                # CANONICALIZES jit outputs to P() for such leaves — a
                # non-canonical input spec would make the step's output
                # signature differ from its input signature and force a
                # SECOND full compile of every batch shape (measured 30-90 s
                # per compile through the axon tunnel).
                spec = P(*(axis if axis is not None
                           and mesh.shape[axis] > 1 else None
                           for axis in spec))
                if not any(axis is not None for axis in spec):
                    break  # fully trivial -> replicated
                # Validate divisibility of every sharded dim.
                ok = True
                for dim, axis in enumerate(spec):
                    if axis is None:
                        continue
                    size = n_model if axis == MODEL_AXIS else mesh.shape[axis]
                    if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                        ok = False
                        break
                if ok:
                    return NamedSharding(mesh, spec)
                break
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(resolve, params)


def replicated(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def batch_sharding(mesh: Mesh, tree: Any, per_host: bool = False) -> Any:
    """Shard the leading (batch) axis of every array leaf over the data
    axis; scalars/strings replicate.

    ``per_host=True``: leaves are HOST-LOCAL shards (multi-controller SPMD —
    each host loads its own slice via ``ShardedSampler``); divisibility is
    checked against this host's share of the data axis, and the resulting
    specs are meant for ``jax.make_array_from_process_local_data``. A leaf
    whose batch dim does NOT divide this host's device share RAISES instead
    of replicating: under ``process_count()>1`` a replicated spec with
    per-host-different rows is silently wrong data (round-2 advisor
    finding) — the fix belongs in the sampler (``QuantizedBatchSampler``
    ``min_size`` keeps every piece a multiple of the per-host share)."""
    div = mesh.shape[DATA_AXIS]
    if per_host:
        n_proc = jax.process_count()
        if div % n_proc:
            raise ValueError(
                f"data axis {div} not divisible by {n_proc} processes")
        div //= n_proc

    def resolve(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim >= 1 and leaf.shape[0] % div == 0:
            # canonical form on a trivial data axis (see param_sharding)
            if mesh.shape[DATA_AXIS] == 1:
                return NamedSharding(mesh, P())
            return NamedSharding(mesh, P(DATA_AXIS))
        if per_host and ndim >= 1:
            raise ValueError(
                f"host-local batch dim {leaf.shape[0]} does not divide this "
                f"host's data-axis share ({div}); replicating it would feed "
                f"different data per host — fix the sampler (quantize batch "
                f"sizes to multiples of {div})")
        return NamedSharding(mesh, P())

    return jax.tree.map(resolve, tree)


def put_host_local_batch(mesh: Mesh, batch: Any) -> Any:
    """Assemble global device arrays from host-local batch shards.

    Single-process: plain sharded ``device_put``. Multi-process: each host
    contributes its rows of the global batch (batch rows laid out
    process-major along the data axis, matching ``ShardedSampler``'s
    per-host batch assignment);
    ``jax.make_array_from_process_local_data`` builds the jax.Array without
    any cross-host transfer. Host-local ``device_put`` against a global
    NamedSharding here would be silently wrong under ``process_count()>1``
    (every host would claim the full batch)."""
    multi = jax.process_count() > 1
    shardings = batch_sharding(mesh, batch, per_host=multi)
    if not multi:
        # device_put straight from host memory: jnp.asarray first would
        # commit the leaf to the default device (a full H2D) and then
        # re-place it against the sharding — two transfers per leaf.
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s), batch, shardings)
    return jax.tree.map(
        lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch, shardings)


def shard_params(mesh: Mesh, params: Any, rules=DEFAULT_PARAM_RULES) -> Any:
    shardings = param_sharding(mesh, params, rules)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    shardings = batch_sharding(mesh, batch)
    return jax.tree.map(jax.device_put, batch, shardings)
