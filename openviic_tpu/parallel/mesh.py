"""Device mesh + sharding rules.

The reference is strictly single-device (SURVEY.md §2.2: zero occurrences
of any distributed primitive; ``model.to(device)`` at
builders/model_builder.py:6-9 is its entire device model).  The TPU-native
replacement is one ``jax.sharding.Mesh``:

 - **data axis**: batch sharded, parameters replicated; XLA inserts the
   gradient all-reduce over ICI (DCN across slices) — no hand-written
   collectives at this model scale.
 - **model axis** (optional tensor parallelism): Megatron-style layout for
   the attention and FFN projections — column-parallel fc_q/fc_k/fc_v and
   FFN fc1 (output dim sharded), row-parallel fc_o and FFN fc2 (input dim
   sharded).  Expressed purely as NamedShardings on the param pytree; XLA
   emits the reduce-scatter/all-reduce pattern.

These are ~50M-param models, so TP is a demonstrator (SURVEY.md §2.2); DP
is the production path.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec) — first match wins.  Paths look like
# "params/encoder/layer_0/mhatt/attention/fc_q/kernel".
_TP_RULES = [
    (re.compile(r"(fc_q|fc_k|fc_v|fc_s)/kernel$"), P(None, "model")),
    (re.compile(r"(fc_q|fc_k|fc_v|fc_s)/bias$"), P("model")),
    (re.compile(r"fc_o/kernel$"), P("model", None)),
    (re.compile(r"pwff/fc1/kernel$"), P(None, "model")),
    (re.compile(r"pwff/fc1/bias$"), P("model")),
    (re.compile(r"pwff/fc2/kernel$"), P("model", None)),
    # the big vocab projection: shard the vocab dim
    (re.compile(r"decoder/fc/kernel$"), P(None, "model")),
]

# Expert parallelism (beyond parity — the reference has no MoE, SURVEY.md
# §2.2 EP row): the MoE FFN's stacked expert weights
# (models/ffn.py MoEPositionWiseFeedForward) shard their leading expert
# axis; GSPMD then partitions the dispatch/expert/combine einsums so each
# device computes only its experts.  The router stays replicated.
_EP_RULES = [
    (re.compile(r"pwff/(w1|w2)$"), P("expert", None, None)),
    (re.compile(r"pwff/(b1|b2)$"), P("expert", None)),
]


def make_mesh(
    axis_sizes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh; default = all devices on one 'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh shape {axis_sizes} needs {int(np.prod(shape))} devices, "
            f"got {len(devices)}"
        )
    return Mesh(np.asarray(devices).reshape(shape), names)


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for params: TP rules when the mesh has a
    'model' axis, EP rules for MoE expert weights when it has an
    'expert' axis, fully replicated otherwise."""
    rules = []
    if "model" in mesh.axis_names:
        rules += _TP_RULES
    if "expert" in mesh.axis_names:
        rules += _EP_RULES

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path: str, leaf) -> P:
        for pattern, spec in rules:
            if pattern.search(path):
                # rank guard: don't apply 2-d specs to 1-d leaves
                if len([s for s in spec]) <= leaf.ndim:
                    return spec
        return P()

    def path_str(path) -> str:
        return "/".join(
            p.key if hasattr(p, "key") else str(getattr(p, "idx", p))
            for p in path
        )

    specs = {path_str(path): spec_for(path_str(path), leaf) for path, leaf in flat}

    def to_sharding(path, leaf):
        return NamedSharding(mesh, specs[path_str(path)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def make_sharded_xe_step(model, optimizer, mesh: Mesh):
    """XE train step jitted with explicit shardings over the mesh.

    State (params/opt_state) follows ``param_shardings``; the batch is
    sharded over 'data'.  XLA inserts the gradient collectives."""
    import jax.numpy as jnp
    import optax

    from openviic_tpu.training.steps import nll_loss

    def xe_step(state, batch):
        rng = jax.random.fold_in(state["rng"], state["step"])

        def loss_fn(params):
            out = model.apply(params, batch, train=True, rngs={"dropout": rng})
            return nll_loss(
                out, batch["shifted_right_caption_tokens"], model.vocab.padding_idx
            )

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        return (
            {
                "params": params,
                "opt_state": opt_state,
                "step": state["step"] + 1,
                "rng": state["rng"],
            },
            loss,
        )

    return jax.jit(xe_step, donate_argnums=(0,))


def shard_state(state, mesh: Mesh, optimizer=None, trainable_mask=None):
    """Place a train-state pytree onto the mesh.

    Params follow ``param_shardings`` (TP rules when the mesh has a
    'model' axis); optimizer state mirrors the param shardings on its
    param-shaped leaves (adam mu/nu, etc.) and is replicated elsewhere
    (counts, scalars); step/rng are replicated.

    With ``optimizer`` given, param-like leaves are identified exactly via
    ``optax.tree_map_params``; otherwise any opt_state subtree whose
    treedef equals the params' treedef follows the param shardings."""
    import optax

    p_sh = param_shardings(state["params"], mesh)
    repl = replicate_sharding(mesh)

    params = jax.device_put(state["params"], p_sh)
    params_def = jax.tree.structure(state["params"])

    if optimizer is not None:
        # an optax.masked optimizer (frozen-backbone models) stores
        # MaskedNode at frozen positions of its param-shaped subtrees; the
        # sharding tree passed alongside must collapse to the same empty
        # nodes there or tree_map_params' flatten_up_to rejects it
        p_sh_opt = p_sh
        if trainable_mask is not None:
            p_sh_opt = jax.tree.map(
                lambda keep, sh: sh if keep else optax.MaskedNode(),
                trainable_mask,
                p_sh,
            )
        opt_state = optax.tree_map_params(
            optimizer,
            lambda leaf, sh: jax.device_put(leaf, sh),
            state["opt_state"],
            p_sh_opt,
            transform_non_params=lambda leaf: jax.device_put(leaf, repl),
        )
    else:

        def is_params_like(subtree) -> bool:
            try:
                return jax.tree.structure(subtree) == params_def
            except Exception:
                return False

        def put_entry(subtree):
            if is_params_like(subtree):
                return jax.device_put(subtree, p_sh)
            return jax.device_put(subtree, repl)

        opt_state = jax.tree.map(
            put_entry, state["opt_state"], is_leaf=is_params_like
        )

    rng = state["rng"]
    if jnp.issubdtype(getattr(rng, "dtype", None), jax.dtypes.prng_key):
        # typed PRNG keys (e.g. a checkpoint-restored key from
        # wrap_key_data) have an extended dtype that device_put cannot
        # place onto non-addressable (multi-host) shardings — round-trip
        # through the raw key data instead
        impl = jax.random.key_impl(rng)
        data = jax.device_put(np.asarray(jax.random.key_data(rng)), repl)
        rng = jax.random.wrap_key_data(data, impl=impl)
    else:
        rng = jax.device_put(rng, repl)

    return {
        "params": params,
        "opt_state": opt_state,
        "step": jax.device_put(state["step"], repl),
        "rng": rng,
    }
