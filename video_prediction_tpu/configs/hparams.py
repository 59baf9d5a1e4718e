"""Hyperparameter system: dataclasses + JSON zoo + ``k=v`` override strings.

Mirrors the reference's three-tier merge (``models/base_model.py#
get_default_hparams_dict`` -> ``--model_hparams_dict`` JSON file ->
``--model_hparams`` comma-separated string parsed by
``tf.contrib.training.HParams.parse``): model-class defaults, then a JSON
file from the ``hparams/<dataset>/<variant>/`` zoo, then CLI overrides.

Types are validated against the dataclass field; list-valued fields accept
both JSON lists and the reference's ``[a, b]`` string syntax.
"""

from __future__ import annotations

import ast
import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Tuple


@dataclasses.dataclass
class ModelHparams:
    """Union of the base-model and SAVP-family hyperparameters.

    Field names follow the reference hparams zoo
    (``hparams/<dataset>/<variant>/model_hparams.json``) so configs are
    drop-in readable. Reference anchors: ``models/base_model.py#
    VideoPredictionModel.get_default_hparams_dict`` and
    ``models/savp_model.py#SAVPVideoPredictionModel.get_default_hparams_dict``.
    """

    # --- sequence structure ---
    context_frames: int = 2
    sequence_length: int = 12
    # --- optimization (base_model) ---
    batch_size: int = 16
    lr: float = 0.001
    end_lr: float = 0.0
    decay_steps: Tuple[int, int] = (200000, 300000)
    beta1: float = 0.9
    beta2: float = 0.999
    max_steps: int = 300000
    # --- reconstruction losses ---
    l1_weight: float = 0.0
    l2_weight: float = 0.0
    vgg_cdist_weight: float = 0.0
    state_weight: float = 0.0
    tv_weight: float = 0.0
    # --- GAN losses ---
    gan_loss_type: str = "LSGAN"
    image_sn_gan_weight: float = 0.0
    image_sn_vae_gan_weight: float = 0.0
    video_sn_gan_weight: float = 0.0
    video_sn_vae_gan_weight: float = 0.0
    # action-conditioned video discriminator (reference
    # ``savp_model.py#create_acvideo_discriminator``): the video SN-disc
    # with per-transition actions tiled over H,W and concatenated to each
    # clip frame's channels; requires an action-conditioned dataset
    acvideo_sn_gan_weight: float = 0.0
    acvideo_sn_vae_gan_weight: float = 0.0
    gan_feature_l2_weight: float = 0.0
    vae_gan_feature_l2_weight: float = 0.0
    clip_length: int = 10
    ndf: int = 32
    # --- VAE losses / latent ---
    kl_weight: float = 0.0
    kl_anneal: str = "linear"  # none | sigmoid | linear
    kl_anneal_k: float = -1.0
    kl_anneal_steps: Tuple[int, int] = (50000, 100000)
    z_l1_weight: float = 0.0
    nz: int = 8
    nef: int = 64
    learn_prior: bool = False
    # Time-invariant latent (SV2P, Babaeizadeh et al. 2018): the posterior
    # encodes the WHOLE clip into ONE (mu, logvar) and a single z is drawn
    # per sequence and broadcast over all T-1 steps (reference
    # ``sv2p_model.py``'s defining stochastic structure). False = the SAVP
    # per-step frame-pair posterior. Incompatible with learn_prior (the
    # in-cell prior is per-step by construction). Same posterior param
    # tree either way (the trunk is shared; features are time-averaged
    # before the mu/logvar heads), so checkpoints interchange.
    latent_time_invariant: bool = False
    # --- generator architecture (savp_model) ---
    ngf: int = 32
    downsample_layer: str = "conv_pool2d"
    upsample_layer: str = "upsample_conv2d"
    norm_layer: str = "instance"
    activation_layer: str = "relu"
    conv_rnn: str = "lstm"  # lstm | gru
    conv_rnn_norm: bool = True  # layer-norm inside the ConvLSTM cells
    learn_initial_state: bool = False  # learned (vs zero) ConvRNN init states
    vgg_weights_path: str = ""  # VGG16 .npz for vgg_cdist_weight / eval csim
    transformation: str = "cdna"  # cdna | dna | stp | flow | direct
    # CDNA/DNA kernel normalization over the spatial taps: "softmax" (SAVP,
    # reference savp_model.py) or "relu" (Finn et al. 2016 relu-then-divide
    # with RELU_SHIFT; reference dna_model.py — the dna/sna model classes
    # default to this)
    kernel_normalization: str = "softmax"
    kernel_size: Tuple[int, int] = (5, 5)
    num_transformed_images: int = 4
    last_frames: int = 1
    prev_image_background: bool = True
    first_image_background: bool = True
    context_images_background: bool = False  # all context frames as candidates
    generate_scratch_image: bool = True
    dependent_mask: bool = True
    where_add: str = "all"  # all | input | middle
    # --- scheduled sampling ---
    schedule_sampling: str = "inverse_sigmoid"  # none | inverse_sigmoid | linear
    schedule_sampling_k: float = 900.0
    schedule_sampling_steps: Tuple[int, int] = (0, 100000)
    # Exact-count teacher forcing: draw exactly round(p*B) ground-truth
    # samples per timestep via a per-step rank cut (the reference
    # ``scheduled_sample``'s shuffle-and-take semantics) instead of i.i.d.
    # bernoulli(p). Same expectation; the exact form removes the per-step
    # count variance. Default off (i.i.d. is the documented, golden-pinned
    # default); turn on for reference-parity runs.
    schedule_sampling_exact: bool = False
    # --- action/state conditioning ---
    use_states: bool = False
    # --- numerics / memory ---
    compute_dtype: str = "float32"  # float32 | bfloat16
    # rematerialize the per-timestep generator cell in the backward pass:
    # trades recompute FLOPs for not storing T-1 sets of activations in HBM
    # (jax.checkpoint on the scanned cell; SURVEY §0 HBM-bandwidth guidance)
    remat: bool = True
    # remat policy: "full" recomputes the whole cell (min memory, max
    # recompute); "names" saves the annotated conv/ConvRNN outputs at every
    # scale (jax.checkpoint_policies.save_only_these_names) so the backward
    # re-executes only the cheap elementwise chains between them — the
    # convs, where the FLOPs are, run once
    remat_policy: str = "full"  # full | names
    # keep the remat CSE barrier even when the scan is fully unrolled.
    # Default False lets XLA CSE the rematerialized cell back together at
    # scan_unroll=0 (no recompute — the measured 1.7x regime), at the cost
    # of ALL timestep activations being live: the full-unroll train step
    # OOMs HBM past ~batch 48 (measured: batch 64 needs 16.38G of 15.75G).
    # True restores the memory bound (recompute returns), letting larger
    # batches compile fully unrolled.
    remat_prevent_cse: bool = False
    # unroll factor of the time scan (trades compile time/code size for
    # cross-timestep fusion); 0 = fully unroll the T-1 loop, which is the
    # fastest option measured on TPU for these short rollouts (1.7x at
    # batch 16 — XLA pipelines across timesteps; see ARCHITECTURE.md)
    scan_unroll: int = 1
    # ConvLSTM gate-conv layout: "merged" = one conv over concat([x, h])
    # (reference BasicConv2DLSTMCell structure; fastest with the
    # fully-unrolled scan — the headline operating point); "split" =
    # separate x/h convs + add (fastest in the rolled-scan remat regime,
    # e.g. large batch). Param trees differ — a checkpoint is tied to the
    # layout it was trained with, and run dirs from before this hparam
    # existed all hold the split layout, so the DEFAULT must stay "split"
    # or their saved model_hparams.json (which lacks the key) would
    # rebuild an unrestorable merged tree. Unroll-0 zoo configs and
    # bench.py opt into "merged" explicitly. Measured numbers in
    # ARCHITECTURE.md perf notes (round 3).
    lstm_gate_conv: str = "split"  # merged | split
    # Dtype of the ConvLSTM gate MATH (post-conv layer norms, sigmoids/tanh,
    # cell-state update). "float32" (default) is the documented stability
    # invariant every golden pins; "bfloat16" halves the dominant HBM-
    # bandwidth term of the large-batch step (the batch-64 OOM report
    # attributed the memory/bandwidth bulk to eleven f32 [B,64,64,128]
    # gate-conv temps) — a measured A/B lever for the perf campaign.
    # Cell carries (c, h) and LN params stay as before in both modes.
    gate_dtype: str = "float32"  # float32 | bfloat16
    # Video-discriminator conv3d formulation: False = direct conv3d (the
    # measured default); True = kt time-shifted batched 2-D convs
    # (ops/spectral.py#_conv3d_as_time_taps, mathematically identical,
    # same param tree). Exists because the disc conv3ds are the worst
    # conv bucket of the batch-64 trace (33% MXU) — an A/B lever that is
    # re-measured per operating point, not assumed. Measured: direct
    # conv3d wins at batch 16 (+26 ms for taps, r3) AND at the r4
    # batch-64 winner point (737.5 vs 550 ms/step) — keep False.
    disc_conv3d_taps: bool = False

    # Enum-valued fields validated at construction. Several consumers
    # resolve these with silent fallbacks (e.g. savp.py's
    # ``jnp.bfloat16 if hp.gate_dtype == "bfloat16" else jnp.float32`` —
    # a typo like "bf16" would quietly run fp32 gates and poison an A/B
    # probe), so reject unknown values here, the one choke point every
    # construction path (defaults, JSON zoo, k=v overrides, replace())
    # goes through.
    _ALLOWED = {
        "gan_loss_type": ("GAN", "LSGAN", "hinge"),
        "kl_anneal": ("none", "sigmoid", "linear"),
        "conv_rnn": ("lstm", "gru"),
        "transformation": ("cdna", "dna", "stp", "flow", "direct"),
        "kernel_normalization": ("softmax", "relu"),
        "where_add": ("all", "input", "middle"),
        "schedule_sampling": ("none", "inverse_sigmoid", "linear", "always"),
        "compute_dtype": ("float32", "bfloat16"),
        "remat_policy": ("full", "names"),
        "lstm_gate_conv": ("merged", "split"),
        "gate_dtype": ("float32", "bfloat16"),
    }

    def __post_init__(self):
        for field, allowed in self._ALLOWED.items():
            value = getattr(self, field)
            if value not in allowed:
                raise ValueError(
                    f"{field}={value!r} is not one of {sorted(allowed)}"
                )

    def replace(self, **kw) -> "ModelHparams":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        # _ALLOWED has no annotation -> not a dataclass field -> not in asdict
        return dataclasses.asdict(self)


@dataclasses.dataclass
class DatasetHparams:
    """Dataset-side hyperparameters (reference ``datasets/base_dataset.py``)."""

    context_frames: int = 2
    sequence_length: int = 12
    long_sequence_length: int = 30
    # Quantum of the random temporal-window start offset: the slice is a
    # CONTIGUOUS sequence_length window starting at a random multiple of
    # time_shift (train) / at 0 (eval) — reference slice_sequences
    # semantics (data/base.py#_slice_sequences). Rounds 1-4 implemented
    # this as a subsample stride (frame skipping); corrected per the r4
    # advisor finding. Reconstruction — re-walk when the mount works
    # (SURVEY §0).
    time_shift: int = 1
    use_state: bool = False
    shuffle_on_val: bool = False
    crop_size: int = 0
    scale_size: int = 0

    def replace(self, **kw) -> "DatasetHparams":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def _coerce(value: Any, field_type: Any) -> Any:
    """Coerce a parsed value to a dataclass field's type."""
    origin = getattr(field_type, "__origin__", None)
    if origin in (tuple, Tuple) or field_type in (tuple,):
        return tuple(value)
    if field_type is bool and isinstance(value, (int, str)):
        if isinstance(value, str):
            return value.lower() in ("true", "1", "yes")
        return bool(value)
    if field_type is float and isinstance(value, int):
        return float(value)
    return value


def parse_overrides(spec: str) -> Dict[str, Any]:
    """Parse ``"k1=v1,k2=v2"`` override strings (HParams.parse-compatible).

    Values are python/JSON literals; bare words become strings. List values
    may use ``[a, b]`` — commas inside brackets are handled.
    """
    out: Dict[str, Any] = {}
    if not spec:
        return out
    # split on commas not inside brackets
    items, depth, cur = [], 0, ""
    for ch in spec:
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        if ch == "," and depth == 0:
            items.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        items.append(cur)
    for item in items:
        if not item.strip():
            continue
        if "=" not in item:
            raise ValueError(f"override {item!r} is not of the form key=value")
        k, v = item.split("=", 1)
        k, v = k.strip(), v.strip()
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v  # bare string
    return out


def apply_overrides(hparams, overrides: Dict[str, Any]):
    """Apply a dict of overrides to a dataclass instance with type coercion.

    Unknown keys raise (same strictness as ``HParams.parse``).
    """
    fields = {f.name: f for f in dataclasses.fields(hparams)}
    kw = {}
    for k, v in overrides.items():
        if k not in fields:
            raise ValueError(
                f"unknown hparam {k!r} for {type(hparams).__name__}; known: {sorted(fields)}"
            )
        kw[k] = _coerce(v, fields[k].type_resolved if hasattr(fields[k], "type_resolved") else _resolve_type(fields[k]))
    return hparams.replace(**kw)


def adopt_inference_defaults(hp: ModelHparams, user_overrides: Dict[str, Any]) -> ModelHparams:
    """Apply the measured inference-side operating point to restored hparams.

    Training hparams are saved per run and restored verbatim by
    evaluate.py/generate.py, but the no-grad rollout has no remat or
    activation-memory wall, so the training-side scan_unroll choice is
    pure overhead there: the fully-unrolled time loop measures ~25%
    faster at eval (143.0 -> 114.4 ms/rollout at effective batch 64 —
    ARCHITECTURE.md generation-throughput table). Adopt scan_unroll=0
    unless the user pinned it via --model_hparams. This is a lowering
    choice only — numerics and the param tree are unchanged, so any
    checkpoint restores identically. (gate_dtype is intentionally NOT
    flipped here: it changes numerics, so eval keeps what was trained.)
    """
    if "scan_unroll" not in user_overrides and hp.scan_unroll != 0:
        hp = hp.replace(scan_unroll=0)
    return hp


def _resolve_type(field: dataclasses.Field):
    t = field.type
    if isinstance(t, str):
        # from __future__ annotations: resolve common cases
        base = t.split("[")[0]
        return {"int": int, "float": float, "bool": bool, "str": str, "Tuple": tuple, "tuple": tuple}.get(base, str)
    return t


def load_hparams_json(path: str | Path) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def zoo_dir() -> Path:
    """Root of the bundled hparams zoo (mirrors reference ``hparams/``)."""
    return Path(__file__).resolve().parent.parent.parent / "hparams"


def resolve_model_hparams(
    defaults: ModelHparams,
    hparams_dict_path: str | None = None,
    hparams_str: str | None = None,
    extra: Dict[str, Any] | None = None,
) -> ModelHparams:
    """Three-tier merge: defaults -> JSON file -> override string -> extra."""
    hp = defaults
    if hparams_dict_path:
        hp = apply_overrides(hp, load_hparams_json(hparams_dict_path))
    if hparams_str:
        hp = apply_overrides(hp, parse_overrides(hparams_str))
    if extra:
        hp = apply_overrides(hp, extra)
    return hp
