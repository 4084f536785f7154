"""8-bit-Adam quality A/B (VERDICT round 1 #10).

Trains the same synthetic regression problem twice — fp32 optax.adamw vs
training.optimizers.adamw8bit (block-quantised moments, bitsandbytes
parity) — from identical init/data/lr, and reports the loss curves.  Backs
PERF.md's "comparable training quality" claim with a measurement:

    python -m this_and_that_vdm_tpu.cli.adam8bit_ab --steps 300

The model is a 2-layer MLP regression (width 256: every moment tensor spans
many 256-element quant blocks, so the quantiser actually quantises).
"""

from __future__ import annotations

import argparse
import json


def run_ab(steps: int = 300, width: int = 256, lr: float = 1e-3, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    import optax

    from ..training.optimizers import adamw8bit

    k_init, k_data, k_w = jr.split(jr.PRNGKey(seed), 3)
    d_in, d_out, n = 32, 8, 512
    x = jr.normal(k_data, (n, d_in))
    w_true = jr.normal(k_w, (d_in, d_out)) / jnp.sqrt(d_in)
    y = jnp.tanh(x @ w_true) + 0.01 * jr.normal(k_w, (n, d_out))

    def init_params(key):
        k1, k2 = jr.split(key)
        return {
            "w1": jr.normal(k1, (d_in, width)) / jnp.sqrt(d_in),
            "b1": jnp.zeros((width,)),
            "w2": jr.normal(k2, (width, d_out)) / jnp.sqrt(width),
            "b2": jnp.zeros((d_out,)),
        }

    def loss_fn(p):
        h = jnp.tanh(x @ p["w1"] + p["b1"])
        return jnp.mean((h @ p["w2"] + p["b2"] - y) ** 2)

    def train(tx):
        params = init_params(k_init)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for i in range(steps):
            params, opt_state, loss = step(params, opt_state)
            if i % 10 == 0 or i == steps - 1:
                losses.append((i, float(loss)))
        return losses

    fp32 = train(optax.adamw(lr))
    q8 = train(adamw8bit(lr))
    return {"fp32": fp32, "adamw8bit": q8}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    args = p.parse_args(argv)
    curves = run_ab(args.steps, args.width, args.lr)
    final_fp32 = curves["fp32"][-1][1]
    final_q8 = curves["adamw8bit"][-1][1]
    print(json.dumps({
        "steps": args.steps,
        "final_loss_fp32": final_fp32,
        "final_loss_adamw8bit": final_q8,
        "ratio": final_q8 / final_fp32,
        "curve_fp32": curves["fp32"],
        "curve_adamw8bit": curves["adamw8bit"],
    }))
    return curves


if __name__ == "__main__":
    main()
