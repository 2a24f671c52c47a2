"""jitted module init.

Eager ``module.init`` dispatches every op individually (each with its
own mini-compile — minutes over a remote-TPU tunnel); one jitted init
is a single compile. Used by every init call site in the framework.
"""
from __future__ import annotations

import jax


def jit_init(module, rngs, *args, method=None, **kwargs):
    """module.init under jit. args must be jax-typed (arrays/shapes)."""
    def _init(rngs, *a):
        return module.init(rngs, *a, method=method, **kwargs)
    return jax.jit(_init)(rngs, *args)
