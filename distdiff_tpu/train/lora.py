"""LoRA fine-tuning for the diffusion UNet (low-rank adapters, TPU-first).

Beyond-reference framework surface: the reference expands datasets with
FROZEN Stable-Diffusion weights (its UNet is never trained —
``generate_data.py`` only samples). Practical expansion pipelines routinely
adapt the generative prior to the target domain first; LoRA (Hu et al.,
arXiv:2106.09685) is the standard parameter-efficient way, and a framework
that "replaces the reference" needs a diffusion-side training story.

Design — functional, no module surgery:

  * the adapter is a SEPARATE flat pytree ``{leaf-path: {"a": [in,r],
    "b": [r,out]}}`` over the targeted 2-D Dense kernels (default: the
    attention ``to_q/to_k/to_v/to_out`` projections, diffusers' default
    target set);
  * every step computes ``W_eff = W + (alpha/r) * a @ b`` INSIDE the jitted
    program (``apply_lora``). At SD sizes the merge is two skinny matmuls +
    an add per projection — noise next to the UNet forward, and XLA fuses
    it into the parameter feed. No flax module changes, so every existing
    entry point (sampling pipeline, guidance, TP shardings) takes LoRA'd
    params unchanged;
  * gradients flow to (a, b) only: the train step differentiates w.r.t.
    the adapter tree argument, the base tree is a constant operand;
  * ``b`` initializes to zero (adapter starts as the identity), ``a`` to a
    scaled normal — the standard LoRA init;
  * the training objective is the diffusion denoising loss on VAE latents:
    eps-prediction MSE (or the v-target for v-prediction models, matching
    ``schedulers/ddim.py:117-124``'s convention) at uniformly sampled
    training timesteps.

CLI: ``distdiff_tpu.cli.train_lora`` trains adapters on an expansion
dataset's latent cache; ``generate_data --lora file.npz`` applies them at
sampling time. Tested in ``tests/test_lora.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from distdiff_tpu.schedulers.ddim import DDIMSchedule, add_noise

DEFAULT_TARGETS: Tuple[str, ...] = ("to_q", "to_k", "to_v", "to_out")

_SEP = "/"


def _path_names(path) -> list:
    return [p.key for p in path if hasattr(p, "key")]


def _is_target(names: list, leaf, targets: Iterable[str]) -> bool:
    if not names or names[-1] != "kernel" or getattr(leaf, "ndim", 0) != 2:
        return False
    # parent module (or grandparent for wrapper layers like ff/net_0/proj)
    for up in (2, 3):
        if len(names) >= up:
            parent = names[-up]
            if any(parent == t or parent.startswith(t) for t in targets):
                return True
    return False


def lora_keys(params: Any, targets: Iterable[str] = DEFAULT_TARGETS):
    """Sorted leaf paths (joined with '/') LoRA will adapt."""
    keys = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = _path_names(path)
        if _is_target(names, leaf, targets):
            keys.append(_SEP.join(names))
    return sorted(keys)


def init_lora(
    rng: jax.Array,
    params: Any,
    rank: int = 4,
    targets: Iterable[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Build the adapter tree: a ~ N(0, 1/rank), b = 0 (identity start)."""
    flat = {
        _SEP.join(_path_names(p)): l
        for p, l in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key in lora_keys(params, targets):
        w = flat[key]
        rng, sub = jax.random.split(rng)
        lora[key] = {
            "a": (jax.random.normal(sub, (w.shape[0], rank), dtype)
                  / np.sqrt(rank)),
            "b": jnp.zeros((rank, w.shape[1]), dtype),
        }
    if not lora:
        raise ValueError(f"no LoRA targets matched {tuple(targets)}")
    return lora


def apply_lora(params: Any, lora: Dict[str, Dict[str, jnp.ndarray]],
               alpha: float = 1.0) -> Any:
    """``W_eff = W + (alpha/rank) a@b`` on the adapted leaves (jit-safe:
    the key set is static; only two skinny matmuls per leaf at runtime)."""
    hits = set()

    def fix(path, w):
        key = _SEP.join(_path_names(path))
        pair = lora.get(key)
        if pair is None:
            return w
        hits.add(key)
        a, b = pair["a"], pair["b"]
        scale = alpha / a.shape[1]
        delta = (a.astype(jnp.float32) @ b.astype(jnp.float32)) * scale
        return (w.astype(jnp.float32) + delta).astype(w.dtype)

    out = jax.tree_util.tree_map_with_path(fix, params)
    missing = set(lora) - hits
    if missing:
        raise KeyError(f"LoRA leaves not found in params: {sorted(missing)}")
    return out


def merge_lora(params: Any, lora, alpha: float = 1.0) -> Any:
    """Bake the adapter into plain weights (export / zero-overhead serve)."""
    return apply_lora(params, lora, alpha)


# ------------------------------------------------------------- persistence

def save_lora(path: str, lora, alpha: float = 1.0) -> None:
    arrs = {"__alpha__": np.float32(alpha)}
    for key, pair in lora.items():
        arrs[f"{key}::a"] = np.asarray(pair["a"])
        arrs[f"{key}::b"] = np.asarray(pair["b"])
    np.savez(path, **arrs)


def load_lora(path: str):
    """-> (lora tree, alpha)."""
    data = np.load(path)
    alpha = float(data["__alpha__"]) if "__alpha__" in data else 1.0
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    for name in data.files:
        if name == "__alpha__":
            continue
        key, part = name.rsplit("::", 1)
        lora.setdefault(key, {})[part] = jnp.asarray(data[name])
    return lora, alpha


# ------------------------------------------------------------- train step

def make_lora_train_step(unet, sched: DDIMSchedule, tx, alpha: float = 1.0,
                         apply_fn=None):
    """Jittable LoRA train step on the diffusion denoising loss.

    ``step(lora, opt_state, base_params, latents, ctx, rng) ->
    (lora, opt_state, loss)`` with latents ALREADY in VAE latent space
    (scaled by the scaling factor — the SDDataset latent cache layout) and
    ``ctx`` the text-encoder states. Timesteps sample uniformly over the
    training discretization; the target follows ``sched.prediction_type``.
    ``apply_fn(unet_params, x_t, t, ctx)`` overrides the UNet call for
    models with extra conditioning (SDXL's {"ctx","add"} pytree).
    """
    n_train = sched.alphas_cumprod.shape[0]
    if apply_fn is None:
        def apply_fn(p, x, t, ctx):
            return unet.apply({"params": p}, x, t, ctx)

    def loss_fn(lora, base_params, latents, ctx, t, noise):
        params = apply_lora(base_params, lora, alpha)
        x_t = add_noise(sched, latents, noise, t)
        pred = apply_fn(params, x_t, t, ctx)
        if sched.prediction_type == "v_prediction":
            a = sched.alphas_cumprod[t].astype(jnp.float32)
            while a.ndim < latents.ndim:
                a = a[..., None]
            target = (jnp.sqrt(a) * noise.astype(jnp.float32)
                      - jnp.sqrt(1.0 - a) * latents.astype(jnp.float32))
        else:
            target = noise.astype(jnp.float32)
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    def step(lora, opt_state, base_params, latents, ctx, rng):
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (latents.shape[0],), 0, n_train)
        noise = jax.random.normal(rng_n, latents.shape, jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(
            lora, base_params, latents, ctx, t, noise)
        import optax

        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step
