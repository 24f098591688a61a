"""Model summary: per-module parameter table and output shapes.

Capability of the reference's layer-summary tooling (hand-rolled hooks at
/root/reference/model.py:895-971 and pytorch_model_summary usage at
model.py:12, ecapa_tdnn.py:203), built on flax's module metadata instead of
forward hooks.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def parameter_table(variables: Dict[str, Any]) -> List[Tuple[str, tuple, int]]:
    """Flatten a variables dict into (path, shape, size) rows."""
    rows = []
    flat = jax.tree_util.tree_flatten_with_path(variables.get("params", variables))[0]
    for path, leaf in flat:
        name = "/".join(
            getattr(p, "key", getattr(p, "idx", str(p))) if not isinstance(p, str) else p
            for p in (getattr(k, "key", k) for k in path)
        )
        rows.append((str(name), tuple(leaf.shape), int(leaf.size)))
    return rows


def summarize(model, example_input, train: bool = False,
              rngs: Optional[dict] = None, print_fn=print) -> Dict[str, Any]:
    """Initialize `model` on `example_input` and print a parameter summary.

    Returns {"n_params", "n_bytes", "output_shapes", "rows"}.
    """
    rngs = rngs or {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, example_input, train)
    out = model.apply(variables, example_input, train,
                      mutable=["batch_stats"] if train else False)
    if train:
        out = out[0]
    outputs = out if isinstance(out, (tuple, list)) else (out,)

    rows = parameter_table(variables)
    n_params = sum(r[2] for r in rows)
    n_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(variables.get("params", variables))
    )

    width = max((len(r[0]) for r in rows), default=20)
    print_fn("-" * (width + 30))
    print_fn(f"{'Parameter':<{width}}  {'Shape':>16}  {'Count':>10}")
    print_fn("=" * (width + 30))
    for name, shape, size in rows:
        print_fn(f"{name:<{width}}  {str(shape):>16}  {size:>10,}")
    print_fn("-" * (width + 30))
    print_fn(f"Total params: {n_params:,} ({n_bytes / 1e6:.2f} MB)")
    print_fn("Output shapes: " + ", ".join(str(tuple(o.shape)) for o in outputs))

    return {
        "n_params": n_params,
        "n_bytes": n_bytes,
        "output_shapes": [tuple(o.shape) for o in outputs],
        "rows": rows,
    }
