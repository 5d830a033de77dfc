"""NaN tripwires and graph debugging.

Reference analogues (SURVEY.md §5): TrainUtils.lua:55-93 embeds
norm-based NaN checks into the column-norm projection, stashes the
offending module into the global `__debug_module` and error()s;
utils.lua:29-72 renders failing nngraph nodes to graphviz SVG.

TPU equivalents:
  - `find_nonfinite(tree)`: host-side scan of a pytree for NaN/Inf,
    returning the offending paths (the "which module" answer);
  - `assert_finite(tree, name)`: jit-compatible tripwire via
    `checkify`-style where used eagerly, or host callback in debug
    runs; the Trainer wires it behind TrainConfig-level debug flags;
  - `jaxpr_dot(fn, *args)`: render a traced jaxpr's equation graph to
    graphviz dot text (the nngraph `customToDot`/`saveSvg`
    replacement) — inspect with `dot -Tsvg`.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.extend as jex
import jax.numpy as jnp
import numpy as np


def find_nonfinite(tree: Any) -> List[str]:
    """Paths of leaves containing NaN/Inf (host-side, concrete arrays)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            bad.append(jax.tree_util.keystr(path))
    return bad


class NonFiniteError(RuntimeError):
    """Raised by the tripwire; carries the offending leaf paths
    (the `__debug_module` stash, reference TrainUtils.lua:58-60)."""

    def __init__(self, name: str, paths: List[str]):
        super().__init__(f"non-finite values in {name}: {paths}")
        self.name = name
        self.paths = paths


def check_finite(tree: Any, name: str = "tree") -> None:
    """Host-side tripwire: raise NonFiniteError listing bad leaves."""
    bad = find_nonfinite(tree)
    if bad:
        raise NonFiniteError(name, bad)


def nonfinite_count(tree: Any) -> jnp.ndarray:
    """Jit-compatible scalar count of non-finite leaf elements — cheap
    to compute on device and check on host once per logging interval."""
    total = jnp.zeros((), jnp.int32)
    for leaf in jax.tree.leaves(tree):
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            total = total + jnp.sum(~jnp.isfinite(leaf)).astype(jnp.int32)
    return total


def jaxpr_dot(fn, *args, **kwargs) -> str:
    """Graphviz dot of the traced jaxpr equation graph."""
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    lines = ["digraph jaxpr {", "  rankdir=TB;", '  node [shape=box, fontsize=10];']
    names = {}

    def vid(v):
        if v not in names:
            names[v] = f"v{len(names)}"
        return names[v]

    for v in jaxpr.jaxpr.invars:
        lines.append(f'  {vid(v)} [label="in {v.aval.str_short()}", color=blue];')
    for i, eqn in enumerate(jaxpr.jaxpr.eqns):
        en = f"e{i}"
        lines.append(f'  {en} [label="{eqn.primitive.name}"];')
        for v in eqn.invars:
            if hasattr(v, "aval") and not isinstance(v, jex.core.Literal):
                lines.append(f"  {vid(v)} -> {en};")
        for v in eqn.outvars:
            lines.append(f"  {en} -> {vid(v)};")
    for v in jaxpr.jaxpr.outvars:
        if hasattr(v, "aval") and not isinstance(v, jex.core.Literal):
            lines.append(f'  {vid(v)} [color=red];')
    lines.append("}")
    return "\n".join(lines)


def save_dot_svg(dot: str, path: str) -> bool:
    """Shell out to graphviz like the reference's saveSvg
    (utils.lua:53-63); returns False if `dot` is unavailable."""
    import shutil
    import subprocess

    if shutil.which("dot") is None:
        with open(path + ".dot", "w") as f:
            f.write(dot)
        return False
    p = subprocess.run(
        ["dot", "-Tsvg", "-o", path], input=dot.encode(), check=False
    )
    return p.returncode == 0
