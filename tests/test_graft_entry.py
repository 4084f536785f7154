"""Driver-hook regression: __graft_entry__.entry() must stay traceable.

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip`` on a virtual mesh; a break there costs a whole round,
so the suite traces the full-size flagship forward abstractly (eval_shape —
no FLOPs) and checks the output contract. ``dryrun_multichip`` itself is
covered by the sharded tests (same programs) and the driver artifact.
"""

import jax
import jax.numpy as jnp


def test_entry_traces_with_real_config():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    # CFG pair, 14 frames, 256x384 latents, 4 output channels, bf16
    assert out.shape == (2, 14, 32, 48, 4)
    assert out.dtype == jnp.bfloat16
