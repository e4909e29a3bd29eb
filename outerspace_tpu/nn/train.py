"""Training / evaluation / finetuning loops (reference ``NN_models/main.py``).

Parity pieces:
- Adam lr=1e-3 + cross-entropy (``main.py:85-88``);
- optional **L2 regularization on both weights and activations** with
  per-layer lambdas (``main.py:114-142`` — the reference hand-tuned
  per-layer coefficients; here they're a config list);
- finetune mode multiplies gradients by the nonzero-weight mask so pruned
  zeros stay zero (``main.py:146-160``);
- best-validation checkpointing (``main.py:169-172``) and loss/accuracy
  history capture (``util.py:27-37``).

TPU-first: one jitted ``train_step`` (donated params/opt state) usable
under ``jax.sharding`` — the same step function is what
``__graft_entry__.dryrun_multichip`` shards over a device mesh.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from outerspace_tpu.nn import prune as prune_lib
from outerspace_tpu.nn.data import batches
from outerspace_tpu.nn.models import make_model


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model_type: str = "MLP1"
    num_epochs: int = 5
    batch_size: int = 1024
    lr: float = 1e-3
    # "const" matches the reference (plain Adam, main.py:77); "cosine"
    # adds a warmup+cosine decay — needed to close the accuracy gap on
    # the surviving 10k-image split (the reference had 45k train images).
    lr_schedule: str = "const"
    # Random ±2px shift augmentation (zero-fill). Off by default (the
    # reference did not augment); the small-data headline runs use it.
    augment: bool = False
    l2reg: bool = False
    weight_lambdas: tuple = (1e-4, 1e-4, 1e-4)
    act_lambdas: tuple = (1e-5, 1e-5)
    finetune: bool = False
    seed: int = 0


def loss_fn(params, apply_fn, x, y, cfg: TrainConfig):
    logits, acts = apply_fn({"params": params}, x)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
    reg = 0.0
    if cfg.l2reg:
        # Weight L2 with per-layer lambdas (kernel leaves in layer order).
        kernels = [
            w
            for path, w in jax.tree_util.tree_flatten_with_path(params)[0]
            if any(getattr(k, "key", None) == "kernel" for k in path)
        ]
        for lam, w in zip(cfg.weight_lambdas, kernels):
            reg = reg + lam * jnp.sum(w * w)
        # Activation L2 (drives activation sparsity, main.py:131-142).
        for lam, a in zip(cfg.act_lambdas, acts):
            reg = reg + lam * jnp.sum(a * a) / a.shape[0]
    acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
    return ce + reg, (ce, acc)


# No buffer donation: the loop aliases `params` into best_params
# (donation would invalidate the kept checkpoint buffer).
@partial(jax.jit, static_argnames=("apply_fn", "cfg", "tx"))
def train_step(params, opt_state, x, y, masks, *, apply_fn, cfg, tx):
    (loss, (ce, acc)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params, apply_fn, x, y, cfg)
    if cfg.finetune:
        grads = prune_lib.apply_grad_mask(grads, masks)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    if cfg.finetune:
        # Keep pruned weights exactly zero even under optimizer momentum.
        params = jax.tree_util.tree_map(
            lambda p, m: p * m.astype(p.dtype), params, masks
        )
    return params, opt_state, loss, acc


def shift_augment(xb: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random per-sample ±2px translations with zero fill (images are
    0-1 normalised so zero is background). Accepts (B, 784) or
    (B, 28, 28[, 1]); returns the same shape."""
    shape = xb.shape
    b = shape[0]
    img = np.asarray(xb, dtype=np.float32).reshape(b, 28, 28)
    pad = np.zeros((b, 32, 32), dtype=np.float32)
    pad[:, 2:30, 2:30] = img
    oy = rng.integers(0, 5, b)
    ox = rng.integers(0, 5, b)
    rows = oy[:, None, None] + np.arange(28)[None, :, None]
    cols = ox[:, None, None] + np.arange(28)[None, None, :]
    out = pad[np.arange(b)[:, None, None], rows, cols]
    return out.reshape(shape)


@partial(jax.jit, static_argnames=("apply_fn",))
def eval_step(params, x, y, *, apply_fn):
    logits, _ = apply_fn({"params": params}, x)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
    acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
    return ce, acc


def evaluate(params, apply_fn, x, y, batch_size: int = 1024):
    """Full-split evaluation (reference ``eval``, ``main.py:26-63``)."""
    losses, accs, n = [], [], 0
    nb = -(-x.shape[0] // batch_size)  # ceil: include the ragged tail
    for i in range(nb):
        xb = x[i * batch_size : (i + 1) * batch_size]
        yb = y[i * batch_size : (i + 1) * batch_size]
        if xb.shape[0] == 0:
            break
        ce, acc = eval_step(params, xb, yb, apply_fn=apply_fn)
        losses.append(float(ce) * xb.shape[0])
        accs.append(float(acc) * xb.shape[0])
        n += xb.shape[0]
    return sum(losses) / max(n, 1), sum(accs) / max(n, 1)


@dataclasses.dataclass
class TrainResult:
    params: Any
    best_params: Any
    best_val_acc: float
    history: dict  # train/val losses + accs per epoch


def train(
    data: dict,
    cfg: TrainConfig,
    init_params: Any | None = None,
    verbose: bool = True,
) -> TrainResult:
    """Train (or finetune) a model; returns final + best-val params.

    ``data`` = {"train": (x, y), "val": (x, y), ...} numpy arrays.
    """
    model = make_model(cfg.model_type)
    x0 = jnp.asarray(data["train"][0][: cfg.batch_size])
    rng = jax.random.PRNGKey(cfg.seed)
    params = (
        init_params
        if init_params is not None
        else model.init(rng, x0)["params"]
    )
    if cfg.lr_schedule == "cosine":
        steps_per_epoch = max(
            1, -(-data["train"][0].shape[0] // cfg.batch_size)
        )
        total = cfg.num_epochs * steps_per_epoch
        sched = optax.warmup_cosine_decay_schedule(
            init_value=cfg.lr * 0.1,
            peak_value=cfg.lr,
            warmup_steps=max(1, total // 20),
            decay_steps=total,
            end_value=cfg.lr * 0.01,
        )
        tx = optax.adam(sched)
    else:
        tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)
    masks = prune_lib.nonzero_masks(params)
    step = partial(train_step, apply_fn=model.apply, cfg=cfg, tx=tx)
    aug_rng = np.random.default_rng(cfg.seed + 1)

    history = {"train_loss": [], "train_acc": [], "val_loss": [], "val_acc": []}
    best_val_acc, best_params = -1.0, params
    for epoch in range(cfg.num_epochs):
        # Reference runs val phase before train each epoch (main.py:90-94).
        val_loss, val_acc = evaluate(
            params, model.apply, *data["val"], cfg.batch_size
        )
        # Capture best-val params NOW, before this epoch's training mutates
        # them — the reference saves best_weights during the val phase
        # (main.py:169-172), i.e. the exact weights that scored val_acc.
        if val_acc > best_val_acc:
            best_val_acc, best_params = val_acc, params
        ep_loss, ep_acc, nb = 0.0, 0.0, 0
        for xb, yb in batches(
            *data["train"], cfg.batch_size, seed=cfg.seed + epoch
        ):
            if cfg.augment:
                xb = shift_augment(xb, aug_rng)
            params, opt_state, loss, acc = step(
                params, opt_state, jnp.asarray(xb), jnp.asarray(yb), masks
            )
            ep_loss += float(loss)
            ep_acc += float(acc)
            nb += 1
        history["train_loss"].append(ep_loss / max(nb, 1))
        history["train_acc"].append(ep_acc / max(nb, 1))
        history["val_loss"].append(val_loss)
        history["val_acc"].append(val_acc)
        if verbose:
            print(
                f"epoch {epoch}: train_loss={history['train_loss'][-1]:.4f} "
                f"train_acc={history['train_acc'][-1]:.4f} "
                f"val_acc={val_acc:.4f}"
            )
    # Final val check for best-params tracking.
    val_loss, val_acc = evaluate(
        params, model.apply, *data["val"], cfg.batch_size
    )
    if val_acc > best_val_acc:
        best_val_acc, best_params = val_acc, params
    return TrainResult(params, best_params, best_val_acc, history)


def finetune(
    data: dict, cfg: TrainConfig, pruned_params: Any, verbose: bool = True
) -> TrainResult:
    """Masked-gradient finetune preserving pruned zeros
    (reference ``main.py:241-242``: finetune = train(finetune=True))."""
    cfg = dataclasses.replace(cfg, finetune=True)
    return train(data, cfg, init_params=pruned_params, verbose=verbose)


def save_params(path: str, params: Any) -> None:
    """Pickle a host copy of the params (reference ``save_model_weights``,
    ``util.py:16-20``). For sharded/large states prefer the orbax
    checkpointer below."""
    host = jax.tree_util.tree_map(np.asarray, params)
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_params(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_checkpoint_orbax(path: str, state: Any) -> None:
    """TPU-idiomatic checkpoint via orbax: works for sharded pytrees
    (params + opt state) on multi-chip meshes — the capability the
    reference's torch ``state_dict`` saves stood for. ``path`` must be
    absolute."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, like: Any | None = None) -> Any:
    """Restore an orbax checkpoint; ``like`` (an abstract/concrete pytree
    of the same structure) enables sharded restoration."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, like)
        return ckptr.restore(path)


def save_training_stats(path: str, history: dict) -> None:
    """Pickle (train_losses, train_accs, val_losses, val_accs) — the
    reference's tuple layout (``util.py:27-37``)."""
    with open(path, "wb") as f:
        pickle.dump(
            (
                history["train_loss"],
                history["train_acc"],
                history["val_loss"],
                history["val_acc"],
            ),
            f,
        )


def plot_training_stats(path_prefix: str, history: dict) -> list[str]:
    """Loss/accuracy curves as PNGs — the reference's
    ``plot_training_stats`` (``util.py:40-58``: one figure for losses,
    one for accuracies, train vs validation). Returns the file paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = range(len(history["train_loss"]))
    paths = []
    for kind in ("loss", "acc"):
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(epochs, history[f"train_{kind}"], label=f"train {kind}")
        ax.plot(epochs, history[f"val_{kind}"], label=f"val {kind}")
        ax.set_xlabel("epoch")
        ax.set_ylabel(kind)
        ax.legend()
        ax.set_title(f"training {kind}")
        out = f"{path_prefix}_{kind}.png"
        fig.savefig(out, dpi=100, bbox_inches="tight")
        plt.close(fig)
        paths.append(out)
    return paths
