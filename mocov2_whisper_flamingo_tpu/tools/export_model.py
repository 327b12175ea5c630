#!/usr/bin/env python
"""Export the compiled inference graph + verification round trip.

Capability parity with the reference's ONNX export (reference:
export_model.py:15-70 — torch.onnx.export with dynamic axes + onnx.checker +
onnxruntime run). The TPU-native serving format is ``jax.export``
(StableHLO): the jitted forward is serialized with symbolic batch/time axes
where possible, checked by deserializing, re-running on dummy inputs, and
comparing against the live model — the same export -> validate -> run
contract.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

logger = logging.getLogger("export_model")


def export_forward(net, params, example_batch, path: str) -> bytes:
    """Serialize the jitted AVNet forward to StableHLO bytes (written to
    ``path``). Returns the serialized blob."""
    import jax
    from jax import export as jexport

    fn = lambda p, b: net.forward(p, b)  # noqa: E731
    exported = jexport.export(jax.jit(fn))(params, example_batch)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    logger.info("exported %d bytes to %s", len(blob), path)
    return blob


def verify_export(path: str, params, example_batch, reference_out=None,
                  atol: float = 1e-4) -> bool:
    """Reload the serialized graph, run it, check shapes/finiteness (and
    closeness to the live model when ``reference_out`` is given) — the
    onnx.checker + onnxruntime analog (reference: export_model.py:9-13,49-70)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    rehydrated = jexport.deserialize(blob)
    out = rehydrated.call(params, example_batch)
    out_np = np.asarray(out)
    ok = np.all(np.isfinite(out_np))
    if reference_out is not None:
        ok = ok and np.allclose(out_np, np.asarray(reference_out), atol=atol)
    logger.info("reloaded graph: out shape %s finite=%s", out_np.shape, bool(ok))
    return bool(ok)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    from mocov2_whisper_flamingo_tpu.config import add_config_flags, config_from_args

    add_config_flags(parser)
    parser.add_argument("--output", default="avsr_model.stablehlo")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax checkpoint dir to export (default: random init)")
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args()
    config = config_from_args(args)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from train import build_net

    if args.tiny:
        config.set_dotted("whisper.model_name", "whisper-tiny")
        config.set_dotted("model.d_model", 64)
        config.set_dotted("model.n_heads", 4)
        config.set_dotted("model.fc_hidden_size", 128)

    net, params = build_net(config, vocab_size=51865)
    if args.checkpoint:
        import orbax.checkpoint as ocp

        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), {"params": params, "step": 0})
        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.checkpoint), target=abstract)["params"]

    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((1, 3000, 80)), jnp.float32),
        jnp.ones((1, 3000), bool),
        jnp.asarray(rng.standard_normal((1, 16, 3, 64, 64)), jnp.float32),
        jnp.ones((1, 16), bool),
        jnp.full((1,), 16, jnp.int32),
    )
    live_out = net.forward(params, batch)
    export_forward(net, params, batch, args.output)
    ok = verify_export(args.output, params, batch, reference_out=live_out)
    print("EXPORT:", "PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
