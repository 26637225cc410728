"""Op backend dispatch.

``backend``: 'auto' uses Pallas kernels on TPU (when the graph carries an
edge blocking) and XLA elsewhere; 'xla' / 'pallas' force a path.
``interpret``: run Pallas kernels in interpreter mode (CPU tests).
``message_dtype``: dtype of edge messages inside the Pallas scatter —
bfloat16 feeds the MXU at full rate with float32 accumulation.
``hub_message_dtype``: message dtype of the hub-dense attention pipeline
(ops/hub_attention.py) — defaults to bfloat16: the hub path is pure
matmul/gather bandwidth with float32 accumulation, so halving message bytes
halves its HBM traffic; exactness tests pin it back to float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_state = {
    "backend": "auto",
    "interpret": False,
    "message_dtype": jnp.float32,
    "hub_message_dtype": jnp.bfloat16,
}


def set_backend(backend: str = "auto", interpret: bool = None,
                message_dtype=None, hub_message_dtype=None) -> None:
    assert backend in ("auto", "xla", "pallas")
    _state["backend"] = backend
    if interpret is not None:
        _state["interpret"] = interpret
    if message_dtype is not None:
        _state["message_dtype"] = message_dtype
    if hub_message_dtype is not None:
        _state["hub_message_dtype"] = hub_message_dtype


def pallas_enabled() -> bool:
    b = _state["backend"]
    if b == "xla":
        return False
    if b == "pallas":
        return True
    if _state["interpret"]:
        return True
    return jax.default_backend() not in ("cpu",)


def interpret_mode() -> bool:
    return _state["interpret"]


def message_dtype():
    return _state["message_dtype"]


def hub_message_dtype():
    return _state["hub_message_dtype"]
