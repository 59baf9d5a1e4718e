"""Base video-prediction model: rollouts, loss assembly, metrics.

TPU-native counterpart of the reference's ``video_prediction/models/
base_model.py`` (``BaseVideoPredictionModel`` / ``VideoPredictionModel``):
the layer that turns a generator (+optional posterior/prior and
discriminators) into training losses according to hparams weights.

Architectural replacement of the reference's multi-GPU tower machinery
(``build_graph`` tower split + ``tf_utils.compute_averaged_gradients``):
here the model is a set of *pure functions* over explicit param pytrees;
data parallelism is applied outside by sharding the batch over a mesh axis
and letting XLA insert the gradient all-reduce (see ``train/step.py``).

Conventions:
- ``batch`` dict: ``images [B,T,H,W,C]`` float32 in [0,1]; optional
  ``actions [B,T-1 or T,na]``, ``states [B,T,ns]``.
- ``gen_images [B,T-1,H,W,C]`` aligns with ``images[:, 1:]``.
- Generator params live under top-level keys ``generator``/``posterior``/
  ``prior``; discriminator params under ``discriminator`` (the split the
  two-optimizer train step partitions on).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_prediction_tpu import losses as L
from video_prediction_tpu import metrics as M
from video_prediction_tpu.configs.hparams import ModelHparams
from video_prediction_tpu.parallel.mesh import constrain_data_parallel
from video_prediction_tpu.models.networks import (
    ACVideoSNDiscriminator,
    ImageSNDiscriminator,
    PosteriorEncoder,
    VideoSNDiscriminator,
)
from video_prediction_tpu.models.savp import SAVPGenerator
from video_prediction_tpu.train import schedules


def images_to_float(images: jax.Array) -> jax.Array:
    """Device-side normalization: uint8 [0,255] -> float32 [0,1].

    Datasets ship uint8 across the host->device boundary (4x less transfer
    than f32 — the H2D link, not the step, bounds real training throughput);
    every jitted entry point normalizes here. Float inputs pass through,
    so tests and user code may feed [0,1] floats directly.
    """
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images


def normalize_batch(batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    if "images" in batch and batch["images"].dtype == jnp.uint8:
        batch = dict(batch)
        batch["images"] = images_to_float(batch["images"])
    return batch


def total_variation(images: jax.Array) -> jax.Array:
    """Mean total variation over [..., H, W, C] (reference ``tv_weight``)."""
    dh = jnp.abs(images[..., 1:, :, :] - images[..., :-1, :, :])
    dw = jnp.abs(images[..., :, 1:, :] - images[..., :, :-1, :])
    return jnp.mean(dh) + jnp.mean(dw)


class VideoPredictionModel:
    """Trainable video prediction model (SAVP family).

    Subclasses override ``default_hparams`` (and optionally the generator
    construction) to realize the reference model zoo: savp, dna, sna, sv2p.
    """

    name = "savp"

    def __init__(self, hparams: ModelHparams, mode: str = "train"):
        self.hparams = hparams
        self.mode = mode
        dtype = jnp.bfloat16 if hparams.compute_dtype == "bfloat16" else None
        self.dtype = dtype
        self.generator = SAVPGenerator(hparams=hparams, dtype=dtype)
        if hparams.latent_time_invariant and hparams.learn_prior:
            raise ValueError(
                "latent_time_invariant (one z per sequence, SV2P) is "
                "incompatible with learn_prior (the in-cell prior is "
                "per-step by construction)"
            )
        self.posterior = (
            PosteriorEncoder(
                nz=hparams.nz,
                nef=hparams.nef,
                time_invariant=hparams.latent_time_invariant,
                dtype=dtype,
            )
            if hparams.nz > 0
            else None
        )
        # learn_prior: the LearnedPrior conv net lives INSIDE the generator
        # cell (models/savp.py) so z_t conditions only on frames the rollout
        # actually has — its params are under params["generator"]
        self.discriminators: Dict[str, nn.Module] = {}
        hp = hparams
        if hp.image_sn_gan_weight or hp.image_sn_vae_gan_weight:
            self.discriminators["image"] = ImageSNDiscriminator(ndf=hp.ndf, dtype=dtype)
        if hp.video_sn_gan_weight or hp.video_sn_vae_gan_weight:
            self.discriminators["video"] = VideoSNDiscriminator(
                ndf=hp.ndf, dtype=dtype, conv3d_taps=hp.disc_conv3d_taps
            )
        if hp.acvideo_sn_gan_weight or hp.acvideo_sn_vae_gan_weight:
            self.discriminators["acvideo"] = ACVideoSNDiscriminator(
                ndf=hp.ndf, dtype=dtype, conv3d_taps=hp.disc_conv3d_taps
            )
        self.vgg = None
        if hp.vgg_cdist_weight:
            # training-time perceptual loss needs real VGG weights
            # (reference downloads them; this env gates on a local .npz)
            from video_prediction_tpu.models.vgg import VGGMetric

            self.vgg = VGGMetric(weights_path=hp.vgg_weights_path or None)

    # ------------------------------------------------------------------ #
    # hparams
    # ------------------------------------------------------------------ #
    @classmethod
    def default_hparams(cls) -> ModelHparams:
        """Reference: ``savp_model.py#SAVPVideoPredictionModel.
        get_default_hparams_dict`` merged over the base-model defaults."""
        return ModelHparams()

    @property
    def has_gan(self) -> bool:
        hp = self.hparams
        return bool(
            hp.image_sn_gan_weight
            or hp.image_sn_vae_gan_weight
            or hp.video_sn_gan_weight
            or hp.video_sn_vae_gan_weight
            or hp.acvideo_sn_gan_weight
            or hp.acvideo_sn_vae_gan_weight
        )

    @property
    def has_vae(self) -> bool:
        return self.hparams.nz > 0

    # ------------------------------------------------------------------ #
    # init
    # ------------------------------------------------------------------ #
    def init_variables(self, rng: jax.Array, batch: Dict[str, jax.Array]):
        """Initialize all params/state. Returns ``(params, state)`` where
        ``state`` holds the spectral-norm power-iteration vectors."""
        hp = self.hparams
        batch = normalize_batch(batch)
        images = batch["images"]
        b, t = images.shape[:2]
        rngs = jax.random.split(rng, 8)
        use_gt = jnp.ones((t - 1, b), bool)

        params: Dict[str, Any] = {}
        state: Dict[str, Any] = {}

        gen_kwargs = self._generator_kwargs(batch)
        zs = jnp.zeros((b, t - 1, hp.nz), jnp.float32) if self.has_vae else None
        gvars = self.generator.init(rngs[0], images, use_gt, zs=zs, **gen_kwargs)
        params["generator"] = gvars["params"]

        if self.posterior is not None:
            pvars = self.posterior.init(rngs[1], images)
            params["posterior"] = pvars["params"]

        if self.discriminators:
            dparams: Dict[str, Any] = {}
            dspectral: Dict[str, Any] = {}
            start0 = jnp.zeros((), jnp.int32)
            clip = self._clip(images[:, 1:], start0)
            for i, (dname, disc) in enumerate(sorted(self.discriminators.items())):
                extra = ()
                if dname == "acvideo":
                    extra = (self._clip(self._transition_actions(batch), start0),)
                dv = disc.init(rngs[3 + i], clip, *extra)
                dparams[dname] = dv["params"]
                dspectral[dname] = dv.get("spectral", {})
                if self._vae_gan_weight(dname) > 0:
                    # separate D instance for the VAE-sampled rollout
                    dv2 = disc.init(jax.random.fold_in(rngs[3 + i], 1), clip, *extra)
                    dparams[dname + "_vae"] = dv2["params"]
                    dspectral[dname + "_vae"] = dv2.get("spectral", {})
            params["discriminator"] = dparams
            state["spectral"] = dspectral
        return params, state

    def _generator_kwargs(self, batch):
        kw = {}
        if "actions" in batch and batch["actions"] is not None:
            kw["actions"] = batch["actions"]
        if self.hparams.use_states and "states" in batch and batch["states"] is not None:
            kw["states"] = batch["states"]
        return kw

    def _gan_weight(self, dname: str) -> float:
        return {
            "image": self.hparams.image_sn_gan_weight,
            "video": self.hparams.video_sn_gan_weight,
            "acvideo": self.hparams.acvideo_sn_gan_weight,
        }[dname]

    def _vae_gan_weight(self, dname: str) -> float:
        return {
            "image": self.hparams.image_sn_vae_gan_weight,
            "video": self.hparams.video_sn_vae_gan_weight,
            "acvideo": self.hparams.acvideo_sn_vae_gan_weight,
        }[dname]

    def _transition_actions(self, batch: Dict[str, jax.Array]) -> jax.Array:
        """Actions aligned with target frames ``images[:, 1:]`` (action t
        drives the t -> t+1 transition). Required by the acvideo
        discriminator; clear error when the dataset has none."""
        actions = batch.get("actions")
        if actions is None:
            raise ValueError(
                "acvideo_sn_gan_weight requires an action-conditioned "
                "dataset (batch has no 'actions')"
            )
        tm1 = batch["images"].shape[1] - 1
        return actions[:, :tm1]

    # ------------------------------------------------------------------ #
    # forward
    # ------------------------------------------------------------------ #
    def forward(
        self,
        params: Dict[str, Any],
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        step: jax.Array,
        train: bool,
        output_aux: bool = False,
    ) -> Dict[str, jax.Array]:
        """Generator-side forward: rollouts + latent stats.

        Returns dict with ``gen_images`` (prior-sampled when stochastic,
        matching the reference's eval convention) and, when the posterior
        is active, ``gen_images_enc`` plus ``(mu, logvar)`` / prior stats.

        TPU-first detail: when both prior and posterior rollouts are needed
        (SAVP = VAE+GAN training), they run as ONE generator call on a
        doubled batch — same weights, twice the MXU work per call, half the
        per-call overhead — instead of two sequential rollouts.
        """
        hp = self.hparams
        batch = normalize_batch(batch)
        images = batch["images"]
        b, t = images.shape[:2]
        rng_ss, rng_q, rng_p = jax.random.split(rng, 3)

        use_gt = schedules.sample_use_gt_mask(rng_ss, step, b, t, hp, train)
        gen_kwargs = self._generator_kwargs(batch)

        out: Dict[str, jax.Array] = {}

        if not self.has_vae:
            gout = self.generator.apply(
                {"params": params["generator"]}, images, use_gt, output_aux=output_aux, **gen_kwargs
            )
            out.update(gout)
            return out

        # --- stochastic path ---
        # With latent_time_invariant (SV2P) the posterior emits ONE
        # (mu, logvar) [B, 1, nz] for the whole clip; a single z is drawn
        # per sequence and broadcast over the T-1 steps below. Latent
        # stats stay un-broadcast in `out` so the KL/z_l1 losses see the
        # sequence-level quantities.
        # Under a spatial mesh the posterior runs data-parallel-only (its
        # strided convs reduce to degenerate per-shard extents; see
        # parallel/mesh.py) — a no-op otherwise.
        mu_q, logvar_q = self.posterior.apply(
            {"params": params["posterior"]}, constrain_data_parallel(images)
        )
        out["zs_mu"], out["zs_logvar"] = mu_q, logvar_q
        eps = jax.random.normal(rng_q, mu_q.shape)
        z_q = mu_q + jnp.exp(0.5 * logvar_q) * eps

        def bz(z):  # broadcast a sequence-level z over all rollout steps
            return jnp.broadcast_to(z, (b, t - 1, hp.nz)) if z.shape[1] != t - 1 else z

        learn_prior = bool(hp.learn_prior)
        if learn_prior:
            # prior stats + z sampling happen INSIDE the generator cell on
            # the rollout's own frames (no future-GT leak); we only supply
            # the reparameterization noise
            eps_p = jax.random.normal(rng_p, mu_q.shape)
        else:
            z_p = jax.random.normal(rng_p, mu_q.shape)  # unit-Gaussian prior
            out["zs_sampled_prior"] = z_p

        need_prior_rollout = (
            (not train)
            or any(self._gan_weight(d) > 0 for d in self.discriminators)
            or hp.z_l1_weight > 0
        )
        need_post_rollout = train

        if need_prior_rollout and need_post_rollout:
            # fused double-batch rollout
            def dup(x):
                return jnp.concatenate([x, x], axis=0) if x is not None else None

            images2 = dup(images)
            use_gt2 = jnp.concatenate([use_gt, use_gt], axis=1)
            kwargs2 = {k: dup(v) for k, v in gen_kwargs.items()}
            if learn_prior:
                # first half: in-cell prior z; second half: posterior z
                zs2 = jnp.concatenate([jnp.zeros_like(z_q), z_q], axis=0)
                kwargs2["prior_eps"] = jnp.concatenate([eps_p, jnp.zeros_like(eps_p)], axis=0)
                kwargs2["use_prior_z"] = jnp.concatenate(
                    [jnp.ones((b,), bool), jnp.zeros((b,), bool)], axis=0
                )
            else:
                zs2 = jnp.concatenate([bz(z_p), bz(z_q)], axis=0)
            gout = self.generator.apply(
                {"params": params["generator"]}, images2, use_gt2, zs=zs2, output_aux=output_aux, **kwargs2
            )
            for k, v in gout.items():
                out[k] = v[:b]
                out[k + "_enc"] = v[b:]
            out["_prior_rollout"] = True
        elif need_post_rollout:
            gout = self.generator.apply(
                {"params": params["generator"]}, images, use_gt, zs=bz(z_q), output_aux=output_aux, **gen_kwargs
            )
            for k, v in gout.items():
                out[k + "_enc"] = v
            out["gen_images"] = gout["gen_images"]  # posterior rollout doubles as main output
        else:
            # eval: prior rollout only
            if learn_prior:
                gout = self.generator.apply(
                    {"params": params["generator"]},
                    images,
                    use_gt,
                    zs=None,
                    prior_eps=eps_p,
                    output_aux=output_aux,
                    **gen_kwargs,
                )
            else:
                gout = self.generator.apply(
                    {"params": params["generator"]}, images, use_gt, zs=bz(z_p), output_aux=output_aux, **gen_kwargs
                )
            out.update(gout)
            out["_prior_rollout"] = True

        if learn_prior:
            # canonicalize in-cell prior outputs: the KL's prior stats must
            # condition on the SAME (teacher-forced) frames the posterior
            # sees -> take the posterior-half stats when present
            if "prior_mu_enc" in out:
                out["prior_mu"] = out.pop("prior_mu_enc")
                out["prior_logvar"] = out.pop("prior_logvar_enc")
            if "z_used" in out:  # the prior rollout's actual z draws
                out["zs_sampled_prior"] = out.pop("z_used")
            out.pop("z_used_enc", None)
        return out

    # ------------------------------------------------------------------ #
    # discriminators
    # ------------------------------------------------------------------ #
    def _clip(self, frames: jax.Array, start: jax.Array) -> jax.Array:
        """Static-size clip of ``clip_length`` frames starting at ``start``
        (the video discriminator's input; reference ``clip_length``)."""
        hp = self.hparams
        tm1 = frames.shape[1]
        clip_len = min(hp.clip_length, tm1)
        start = jnp.clip(start, 0, tm1 - clip_len)
        return jax.lax.dynamic_slice_in_dim(frames, start, clip_len, axis=1)

    def apply_discriminator(
        self,
        params: Dict[str, Any],
        spectral: Dict[str, Any],
        dname: str,
        key: str,
        clips: jax.Array,
        update_spectral: bool,
        extra: Tuple[jax.Array, ...] = (),
    ):
        """Run discriminator ``dname`` (params under ``key``) on clips
        (+ per-disc ``extra`` inputs, e.g. the acvideo action clip).

        Returns ``(logits, features, new_spectral_for_key)``.
        """
        disc = self.discriminators[dname]
        variables = {"params": params["discriminator"][key], "spectral": spectral[key]}
        if update_spectral:
            (logits, feats), new_vars = disc.apply(variables, clips, *extra, mutable=["spectral"])
            return logits, feats, new_vars["spectral"]
        logits, feats = disc.apply(variables, clips, *extra)
        return logits, feats, spectral[key]

    # ------------------------------------------------------------------ #
    # losses
    # ------------------------------------------------------------------ #
    def compute_losses(
        self,
        params: Dict[str, Any],
        state: Dict[str, Any],
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        step: jax.Array,
        train: bool = True,
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """Assemble the full objective (reference ``generator_loss_fn`` +
        ``discriminator_loss_fn``).

        Returns ``(total, aux)`` where gradients of ``total`` w.r.t. the
        generator-side keys equal the generator loss gradients and w.r.t.
        ``discriminator`` equal the discriminator loss gradients —
        stop-gradients are placed so one backward pass yields the joint
        G+D update the reference performs in a single ``sess.run``.
        """
        hp = self.hparams
        rng_fwd, rng_clip = jax.random.split(rng)
        batch = normalize_batch(batch)
        images = batch["images"]
        target = images[:, 1:]

        out = self.forward(params, batch, rng_fwd, step, train=train)
        gen_images = out["gen_images"]
        recon_images = out.get("gen_images_enc", gen_images)

        g_losses: Dict[str, jax.Array] = {}
        d_losses: Dict[str, jax.Array] = {}

        if hp.l1_weight:
            g_losses["l1"] = hp.l1_weight * L.l1_loss(recon_images, target)
        if hp.l2_weight:
            g_losses["l2"] = hp.l2_weight * L.l2_loss(recon_images, target)
        if hp.tv_weight:
            g_losses["tv"] = hp.tv_weight * total_variation(recon_images)
        if hp.state_weight and "gen_states" in out and "states" in batch:
            g_losses["state"] = hp.state_weight * L.l2_loss(
                out.get("gen_states_enc", out["gen_states"]), batch["states"][:, 1:]
            )
        if hp.vgg_cdist_weight and self.vgg is not None:
            # perceptual cosine *distance* on the reconstruction rollout
            # (reference ``vgg_cdist_weight``); differentiable through the
            # frozen VGG features
            csim = self.vgg._csim(recon_images, target)
            g_losses["vgg_cdist"] = hp.vgg_cdist_weight * jnp.mean(1.0 - csim)
        if self.has_vae and hp.kl_weight:
            anneal = schedules.kl_weight(step, hp)
            g_losses["kl"] = hp.kl_weight * anneal * L.kl_loss(
                out["zs_mu"],
                out["zs_logvar"],
                out.get("prior_mu"),
                out.get("prior_logvar"),
            )
        if self.has_vae and hp.z_l1_weight and out.get("_prior_rollout"):
            # latent cycle loss (BicycleGAN-style, reference ``z_l1_weight``):
            # the prior-sampled rollout must be re-encodable to the z it used.
            # Re-encode adjacent generated frames (first frame = GT frame 0)
            # with the posterior and L1 against the z that generated them.
            gen_seq = jnp.concatenate([batch["images"][:, :1], out["gen_images"]], axis=1)
            mu_hat, _ = self.posterior.apply(
                {"params": params["posterior"]}, constrain_data_parallel(gen_seq)
            )
            g_losses["z_l1"] = hp.z_l1_weight * L.l1_loss(mu_hat, out["zs_sampled_prior"])

        new_spectral = dict(state.get("spectral", {}))
        if self.discriminators and train:
            tm1 = target.shape[1]
            clip_len = min(hp.clip_length, tm1)
            start = jax.random.randint(rng_clip, (), 0, tm1 - clip_len + 1)
            # discs run data-parallel-only under a spatial mesh (no-op
            # otherwise): their stride-2 chains reach degenerate per-shard
            # extents where GSPMD miscompiles fused SN kernels (measured,
            # parallel/mesh.py), and they are a small slice of step time
            real_clip = constrain_data_parallel(self._clip(target, start))

            sg = jax.lax.stop_gradient
            params_d_sg = jax.tree_util.tree_map(sg, params["discriminator"])

            def run_pair(dname: str, key: str, fake_frames: jax.Array, weight: float, prefix: str):
                """real/fake D losses + generator GAN loss for one disc."""
                fake_clip = constrain_data_parallel(self._clip(fake_frames, start))
                extra = ()
                if dname == "acvideo":
                    action_clip = self._clip(self._transition_actions(batch), start)
                    extra = (action_clip,)
                # D update path: real & stop-grad fake in one batched call
                both = jnp.concatenate([real_clip, sg(fake_clip)], axis=0)
                extra_both = tuple(jnp.concatenate([e, e], axis=0) for e in extra)
                logits_both, feats_both, new_sp = self.apply_discriminator(
                    params, state["spectral"], dname, key, both, update_spectral=True, extra=extra_both
                )
                new_spectral[key] = new_sp
                logits_real, logits_fake = jnp.split(logits_both, 2, axis=0)
                d_losses[f"{prefix}_real"] = weight * L.gan_loss(logits_real, 1.0, hp.gan_loss_type)
                d_losses[f"{prefix}_fake"] = weight * L.gan_loss(logits_fake, 0.0, hp.gan_loss_type)
                # G update path: gradients flow into the generator only
                params_sg = {**params, "discriminator": params_d_sg}
                logits_g, feats_g, _ = self.apply_discriminator(
                    params_sg, state["spectral"], dname, key, fake_clip, update_spectral=False, extra=extra
                )
                g_losses[prefix] = weight * L.gan_loss(logits_g, 1.0, hp.gan_loss_type)
                feat_w = hp.gan_feature_l2_weight if not key.endswith("_vae") else hp.vae_gan_feature_l2_weight
                if feat_w:
                    # real features are the matching TARGET: stop-grad them so
                    # this generator loss sends no gradient into D (reference
                    # computes g_loss grads for g_vars only — without the sg,
                    # the joint single-backward here would leak the feature
                    # loss into the D update)
                    feats_real = [sg(jnp.split(f, 2, axis=0)[0]) for f in feats_both]
                    g_losses[prefix + "_feat"] = feat_w * L.feature_matching_loss(feats_real, feats_g)

            for dname in sorted(self.discriminators):
                w = self._gan_weight(dname)
                if w:
                    run_pair(dname, dname, gen_images, w, f"{dname}_gan")
                w_vae = self._vae_gan_weight(dname)
                if w_vae and "gen_images_enc" in out:
                    run_pair(dname, dname + "_vae", out["gen_images_enc"], w_vae, f"{dname}_vae_gan")

        g_total = sum(g_losses.values()) if g_losses else jnp.float32(0.0)
        d_total = sum(d_losses.values()) if d_losses else jnp.float32(0.0)
        total = g_total + d_total

        aux = {
            "outputs": out,
            "g_losses": g_losses,
            "d_losses": d_losses,
            "g_loss": g_total,
            "d_loss": d_total,
            "new_state": {"spectral": new_spectral} if new_spectral else {},
        }
        return total, aux

    # ------------------------------------------------------------------ #
    # metrics
    # ------------------------------------------------------------------ #
    def metrics_fn(self, outputs: Dict[str, jax.Array], batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Per-frame eval metrics on the prediction span (frames
        ``context..T-1``), averaged over batch (reference
        ``base_model.py#metrics_fn``)."""
        hp = self.hparams
        batch = normalize_batch(batch)
        target = batch["images"][:, hp.context_frames :]
        pred = outputs["gen_images"][:, hp.context_frames - 1 :]
        psnr = M.peak_signal_to_noise_ratio(target, pred)  # [B, Tp]
        ssim = M.structural_similarity(target, pred)
        mse = M.mean_squared_error(target, pred)
        return {
            "psnr": jnp.mean(psnr),
            "ssim": jnp.mean(ssim),
            "mse": jnp.mean(mse),
            "psnr_per_frame": jnp.mean(psnr, axis=0),
            "ssim_per_frame": jnp.mean(ssim, axis=0),
        }


class NonTrainableVideoPredictionModel(VideoPredictionModel):
    """Baselines with no parameters (reference ``non_trainable_model.py``)."""

    trainable = False

    def __init__(self, hparams: ModelHparams, mode: str = "train"):
        self.hparams = hparams
        self.mode = mode
        self.dtype = None
        self.generator = None
        self.posterior = None
        self.discriminators = {}

    def init_variables(self, rng, batch):
        return {}, {}

    def compute_losses(self, params, state, batch, rng, step, train=True):
        out = self.forward(params, batch, rng, step, train)
        aux = {
            "outputs": out,
            "g_losses": {},
            "d_losses": {},
            "g_loss": jnp.float32(0.0),
            "d_loss": jnp.float32(0.0),
            "new_state": {},
        }
        return jnp.float32(0.0), aux


class GroundTruthVideoPredictionModel(NonTrainableVideoPredictionModel):
    """Outputs the ground-truth future (reference ``GroundTruthVideoPredictionModel``)."""

    name = "ground_truth"

    def forward(self, params, batch, rng, step, train, **kw):
        return {"gen_images": images_to_float(batch["images"][:, 1:])}


class RepeatVideoPredictionModel(NonTrainableVideoPredictionModel):
    """Repeats the last context frame (reference ``RepeatVideoPredictionModel``)."""

    name = "repeat"

    def forward(self, params, batch, rng, step, train, **kw):
        hp = self.hparams
        images = images_to_float(batch["images"])
        t = images.shape[1]
        last_context = images[:, hp.context_frames - 1]
        # frames 1..context-1 are the ground truth context (shifted),
        # frames context..T-1 repeat the last context frame
        ctx = images[:, 1 : hp.context_frames]
        rep = jnp.repeat(last_context[:, None], t - hp.context_frames, axis=1)
        return {"gen_images": jnp.concatenate([ctx, rep], axis=1)}
