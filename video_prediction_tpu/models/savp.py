"""SAVP model: ConvLSTM encoder-decoder generator with transformation
kernels, compositing, scheduled sampling, VAE posterior/prior, and SN-GAN
discriminators.

TPU-native counterpart of the reference's ``video_prediction/models/
savp_model.py`` (``SAVPVideoPredictionModel`` / ``SAVPCell`` /
``apply_kernels`` / ``generator_fn`` / ``discriminator_fn``), re-designed
for XLA:

- The per-timestep cell is a flax module scanned over time with
  ``nn.scan`` (replacing ``tf.nn.dynamic_rnn``); the whole rollout compiles
  into one fused on-device loop.
- Scheduled sampling is a per-(step, sample) bernoulli mask sampled
  *outside* the scan from the step-dependent probability, selected inside
  with ``jnp.where`` — no retracing, no host sync.
- CDNA/DNA kernel application is the shifted-FMA tap formulation from
  ``ops/cdna.py`` (kh*kw shifted fused multiply-adds, no patch tensor in
  HBM), not the grouped-conv CUDA trick.
- The VAE posterior encodes all frame pairs as one folded batch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from video_prediction_tpu.configs.hparams import ModelHparams
from video_prediction_tpu.ops import cdna as cdna_ops
from video_prediction_tpu.ops import warp as warp_ops
from video_prediction_tpu.ops.layers import (
    Conv2D,
    get_activation,
    get_downsample_layer,
    get_norm_layer,
    get_upsample_layer,
)
from video_prediction_tpu.models.networks import LearnedPrior
from video_prediction_tpu.ops.rnn import ConvGRUCell, ConvLSTMCell

Dtype = Any


class _SplitInputConv2D(nn.Module):
    """One logical SAME conv over the channel-concat of two inputs, applied
    as two kernel-slice convs + add — skips materializing the concat (the
    profiled batch-16 step spent ~3.6 ms/step on the mask-head concat at
    84 GB/s). Param tree and init RNG paths are IDENTICAL to
    ``Conv2D(name=...)`` (an ``nn.Conv`` child named ``Conv_0`` holding
    ``kernel [k,k,C1+C2,F]`` / ``bias``), so checkpoints are
    interchangeable with the concat formulation."""

    features: int
    kernel_size: int = 3
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        c1, c2 = a.shape[-1], b.shape[-1]
        inner = _SplitInputConvInner(
            features=self.features, kernel_size=self.kernel_size, dtype=self.dtype, name="Conv_0"
        )
        return inner(a, b, c1 + c2)


class _SplitInputConvInner(nn.Module):
    features: int
    kernel_size: int
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array, c_total: int) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, c_total, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        dt = self.dtype or a.dtype
        c1 = a.shape[-1]

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x.astype(dt),
                w.astype(dt),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        y = conv(a, kernel[:, :, :c1]) + conv(b, kernel[:, :, c1:])
        return y + bias.astype(y.dtype)


def _tile_concat(x: jax.Array, vec: jax.Array) -> jax.Array:
    """Tile a [B, D] vector spatially and concat to [B, H, W, C] features.

    Reference: savp_model's ``tile_concat`` conditioning pattern.
    """
    b, h, w, _ = x.shape
    tiled = jnp.broadcast_to(vec[:, None, None, :], (b, h, w, vec.shape[-1]))
    return jnp.concatenate([x, tiled.astype(x.dtype)], axis=-1)


class SAVPCell(nn.Module):
    """One generator timestep (reference ``savp_model.py#SAVPCell.call``).

    carry = (rnn_states, gen_image, last_images, current_state?)
    x     = {image, use_gt, z?, action?}
    out   = {gen_image, masks?, kernels?} (+gen_state when use_states)

    ``current_state`` (when ``use_states``) is the rolled-out low-dim state:
    initialized from the true initial state and always advanced by the
    linear state head — never reset to ground truth — matching the
    reference's Finn-style state rollout (``dna_model.py`` carries
    ``current_state`` through the fc predictor).
    """

    hparams: ModelHparams
    num_scales: int  # downsamples; bottleneck at H / 2**num_scales
    dtype: Dtype | None = None

    def _conv_rnn(self, features: int, name: str):
        hp = self.hparams
        if hp.conv_rnn == "lstm":
            return ConvLSTMCell(
                features,
                5,
                use_norm=hp.conv_rnn_norm,
                gate_conv=hp.lstm_gate_conv,
                dtype=self.dtype,
                gate_dtype=jnp.bfloat16 if hp.gate_dtype == "bfloat16" else jnp.float32,
                name=name,
            )
        if hp.conv_rnn == "gru":
            return ConvGRUCell(features, 5, dtype=self.dtype, name=name)
        raise ValueError(f"unknown conv_rnn {hp.conv_rnn!r}")

    def init_rnn_states(self, batch: int, height: int, width: int, dtype=jnp.float32):
        """Zero states for all encoder+decoder ConvRNNs."""
        hp = self.hparams
        states = []
        # encoder scales 1..num_scales
        for s in range(1, self.num_scales + 1):
            feats = hp.ngf * (2**s)
            hh, ww = height // (2**s), width // (2**s)
            if hp.conv_rnn == "lstm":
                states.append(
                    (jnp.zeros((batch, hh, ww, feats), dtype), jnp.zeros((batch, hh, ww, feats), dtype))
                )
            else:
                states.append(jnp.zeros((batch, hh, ww, feats), dtype))
        # decoder scales num_scales-1..0
        for s in range(self.num_scales - 1, -1, -1):
            feats = hp.ngf * (2**s)
            hh, ww = height // (2**s), width // (2**s)
            if hp.conv_rnn == "lstm":
                states.append(
                    (jnp.zeros((batch, hh, ww, feats), dtype), jnp.zeros((batch, hh, ww, feats), dtype))
                )
            else:
                states.append(jnp.zeros((batch, hh, ww, feats), dtype))
        return tuple(states)

    @nn.compact
    def __call__(self, carry, x):
        hp = self.hparams
        rnn_states, gen_image, last_images, current_state = carry
        # thread the compute dtype through the norm layers too — otherwise
        # they upcast every activation after them to f32 (HBM blowup)
        norm_cls = get_norm_layer(hp.norm_layer)
        norm = lambda name: norm_cls(dtype=self.dtype, name=name)
        act = get_activation(hp.activation_layer)
        down = get_downsample_layer(hp.downsample_layer)
        up = get_upsample_layer(hp.upsample_layer)

        use_gt = x["use_gt"]  # [B] bool
        image = jnp.where(use_gt[:, None, None, None], x["image"], gen_image)
        b, hgt, wid, c = image.shape
        aux: Dict[str, jax.Array] = {}

        # rolling buffer of the last `last_frames` input images
        last_images = jnp.concatenate([last_images[:, 1:], image[:, None]], axis=1)

        # low-dim state: gated by the SAME scheduled-sampling mask as the
        # images (reference SAVPCell: state = where(ground_truth[t],
        # inputs['states'], gen_state)) — ground-truth states condition the
        # cell during context frames (observable at deployment) and
        # GT-sampled steps; otherwise the rolled-out prediction carries
        if (
            hp.use_states
            and current_state is not None
            and x.get("state") is not None
        ):
            current_state = jnp.where(
                use_gt[:, None], x["state"].astype(current_state.dtype), current_state
            )

        z = x.get("z")
        if hp.learn_prior and hp.nz > 0:
            # learned prior p(z_t | x_t) runs IN-CELL on the frame the cell
            # actually consumes (GT during context/teacher-forced steps, the
            # model's own prediction otherwise): eval rollouts never see
            # future ground-truth frames (r2 VERDICT learned-prior leak fix)
            mu_p, logvar_p = LearnedPrior(
                nz=hp.nz, nef=hp.nef // 2 or 16, dtype=self.dtype, name="prior"
            )(image)
            aux["prior_mu"], aux["prior_logvar"] = mu_p, logvar_p
            z_prior = mu_p + jnp.exp(0.5 * logvar_p) * x["prior_eps"]
            if z is None:
                z = z_prior
            else:
                z = jnp.where(x["use_prior_z"][:, None], z_prior, z)
            aux["z_used"] = z

        cond_vecs = []
        if x.get("action") is not None:
            cond_vecs.append(x["action"])
        if current_state is not None and hp.use_states:
            cond_vecs.append(current_state)
        cond = jnp.concatenate(cond_vecs, axis=-1) if cond_vecs else None

        inputs = image.astype(self.dtype or image.dtype)
        if cond is not None:
            inputs = _tile_concat(inputs, cond)
        if z is not None and hp.where_add in ("input", "all"):
            inputs = _tile_concat(inputs, z)

        # ``checkpoint_name`` marks the conv/ConvRNN outputs — the tensors
        # whose recompute is the expensive part of blanket remat — as the
        # save set for ``remat_policy="names"``
        # (jax.checkpoint_policies.save_only_these_names in SAVPGenerator);
        # a no-op identity under any other policy
        ckpt = lambda t: checkpoint_name(t, "savp_saveable")

        # ---- encoder ----
        h = Conv2D(hp.ngf, 3, dtype=self.dtype, name="stem")(inputs)
        h = ckpt(act(norm(name="stem_norm")(h)))
        skips = [h]
        new_states = []
        si = 0
        for s in range(1, self.num_scales + 1):
            feats = hp.ngf * (2**s)
            h = down(feats, dtype=self.dtype, name=f"down{s}")(h)
            h = ckpt(act(norm(name=f"down{s}_norm")(h)))
            if z is not None and hp.where_add == "all":
                h = _tile_concat(h, z)
            if cond is not None and hp.where_add == "all":
                h = _tile_concat(h, cond)
            state, h = self._conv_rnn(feats, f"enc_rnn{s}")(rnn_states[si], h)
            h = ckpt(h)
            new_states.append(state)
            si += 1
            skips.append(h)

        bottleneck = h  # [B, H/2^S, W/2^S, ngf*2^S]

        # ---- decoder ----
        for s in range(self.num_scales - 1, -1, -1):
            feats = hp.ngf * (2**s)
            h = up(feats, dtype=self.dtype, name=f"up{s}")(h)
            h = ckpt(act(norm(name=f"up{s}_norm")(h)))
            h = jnp.concatenate([h, skips[s]], axis=-1)
            if z is not None and hp.where_add in ("all", "middle"):
                h = _tile_concat(h, z)
            state, h = self._conv_rnn(feats, f"dec_rnn{s}")(rnn_states[si], h)
            h = ckpt(h)
            new_states.append(state)
            si += 1
        feat_top = h  # full resolution, ngf channels

        # ---- transformation heads ----
        kh, kw = hp.kernel_size
        n_trans = hp.num_transformed_images
        candidates = []
        if hp.transformation == "cdna":
            if n_trans > 0:
                pooled = jnp.mean(bottleneck, axis=(1, 2))  # [B, feats] (GAP: cheaper
                # than the reference's full flatten->dense and resolution-agnostic)
                raw = nn.Dense(kh * kw * n_trans, dtype=self.dtype, name="cdna_head")(pooled)
                kernels = cdna_ops.normalize_kernels(
                    raw.reshape(b, kh, kw, n_trans).astype(jnp.float32),
                    hp.kernel_normalization,
                )
                aux["kernels"] = kernels
                for f in range(hp.last_frames):
                    frame = last_images[:, -(f + 1)]
                    transformed = cdna_ops.apply_cdna_kernels(frame, kernels)  # [B,N,H,W,C]
                    candidates.extend([transformed[:, i] for i in range(n_trans)])
        elif hp.transformation == "dna":
            raw = Conv2D(kh * kw, 3, dtype=self.dtype, name="dna_head")(feat_top)
            kernels = cdna_ops.normalize_kernels(
                raw.astype(jnp.float32).reshape(b, hgt, wid, kh, kw, 1),
                hp.kernel_normalization,
            )
            transformed = cdna_ops.apply_dna_kernels(image, kernels)
            candidates.append(transformed[:, 0])
        elif hp.transformation == "stp":
            # spatial-transformer kernels (reference dna_model.py STP /
            # Finn et al. 2016): N per-sample affine transforms predicted
            # from the bottleneck through a small fc, zero-initialized so
            # every transform starts at the identity warp
            if n_trans > 0:
                pooled = jnp.mean(bottleneck, axis=(1, 2))
                hfc = act(nn.Dense(100, dtype=self.dtype, name="stp_fc")(pooled))
                raw = nn.Dense(
                    6 * n_trans,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    name="stp_head",
                )(hfc)
                affine = raw.astype(jnp.float32).reshape(b, n_trans, 6)
                aux["stp_params"] = affine
                for f in range(hp.last_frames):
                    frame = last_images[:, -(f + 1)]
                    transformed = warp_ops.apply_affine_kernels(frame, affine)
                    candidates.extend(transformed[:, i] for i in range(n_trans))
        elif hp.transformation == "flow":
            flows = Conv2D(2 * n_trans, 3, dtype=self.dtype, name="flow_head")(feat_top)
            flows = flows.astype(jnp.float32).reshape(b, hgt, wid, 2, n_trans)
            aux["flows"] = flows
            for i in range(n_trans):
                candidates.append(warp_ops.image_warp(image, flows[..., i]))
        elif hp.transformation == "direct":
            pass
        else:
            raise ValueError(f"unknown transformation {hp.transformation!r}")

        if hp.prev_image_background:
            candidates.append(image)
        # context_images_background subsumes first_image_background (context
        # frame 0 IS the first image) — the reference guards the same way,
        # so num_masks / the mask-head channel count match its checkpoints
        if hp.first_image_background and not hp.context_images_background:
            candidates.append(x["first_image"])
        if hp.context_images_background and "context_images" in x:
            ctx_imgs = x["context_images"]  # [B, ctx, H, W, C]
            candidates.extend(ctx_imgs[:, i] for i in range(ctx_imgs.shape[1]))
        if hp.generate_scratch_image or not candidates:
            scratch = nn.sigmoid(Conv2D(c, 3, dtype=self.dtype, name="scratch_head")(feat_top))
            candidates.append(scratch.astype(image.dtype))

        # ---- compositing masks ----
        num_masks = len(candidates)
        if num_masks == 1:
            gen_image_new = candidates[0]
        else:
            # Regime-dependent compositing formulation (identical math AND
            # identical param tree — checkpoints interchangeable). At full
            # unroll (scan_unroll=0) the kernel-slice conv + FMA
            # accumulation wins (248 vs 253 ms/step, batch 16: no concat
            # buffer, no [B,H,W,C,K] stack); in the ROLLED remat regime the
            # same formulation inflates recompute (757 vs 713 ms at batch
            # 64 unroll 6, executed flops 73.8 vs 66.7 TF), so the concat +
            # einsum form stays for rolled scans.
            # (the CSE'd-remat full-unroll regime only: with
            # remat_prevent_cse the backward re-executes the cell, and the
            # fused form inflates that recompute just like the rolled case)
            fused_composite = hp.scan_unroll == 0 and not (
                hp.remat and hp.remat_prevent_cse
            )
            if hp.dependent_mask and fused_composite:
                cand_cat = jnp.concatenate(
                    [cand.astype(feat_top.dtype) for cand in candidates], axis=-1
                )
                mask_logits = _SplitInputConv2D(num_masks, 3, dtype=self.dtype, name="mask_head")(
                    feat_top, cand_cat
                )
            elif hp.dependent_mask:
                mask_in = jnp.concatenate(
                    [feat_top] + [cand.astype(feat_top.dtype) for cand in candidates], axis=-1
                )
                mask_logits = Conv2D(num_masks, 3, dtype=self.dtype, name="mask_head")(mask_in)
            else:
                mask_logits = Conv2D(num_masks, 3, dtype=self.dtype, name="mask_head")(feat_top)
            masks = jax.nn.softmax(mask_logits.astype(jnp.float32), axis=-1)
            aux["masks"] = masks
            if fused_composite:
                gen_image_new = sum(
                    cand.astype(jnp.float32) * masks[..., k : k + 1]
                    for k, cand in enumerate(candidates)
                )
            else:
                stacked = jnp.stack(candidates, axis=-1).astype(jnp.float32)  # [B,H,W,C,K]
                gen_image_new = jnp.einsum("bhwck,bhwk->bhwc", stacked, masks)
        gen_image_new = gen_image_new.astype(image.dtype)

        out = {"gen_image": gen_image_new}
        new_state = current_state
        if hp.use_states and current_state is not None and x.get("action") is not None:
            # linear state predictor, as in Finn et al. CDNA (reference
            # dna_model/savp state head): next state from the ROLLED-OUT
            # [current_state, action] — predicted states feed the next step
            sa = jnp.concatenate([current_state, x["action"]], axis=-1)
            new_state = nn.Dense(current_state.shape[-1], name="state_head")(sa)
            out["gen_state"] = new_state
        out.update(aux)

        new_carry = (tuple(new_states), gen_image_new, last_images, new_state)
        return new_carry, out


class SAVPGenerator(nn.Module):
    """Full-rollout generator: scans ``SAVPCell`` over time.

    ``__call__(images[B,T,H,W,C], use_gt[T-1,B], zs[B,T-1,nz]?, actions?,
    states?) -> {gen_images [B,T-1,H,W,C], ...}``

    Predictions are for frames 1..T-1 (same convention as the reference:
    ``gen_images`` aligns with ``images[:, 1:]``).
    """

    hparams: ModelHparams
    dtype: Dtype | None = None

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        use_gt: jax.Array,
        zs: Optional[jax.Array] = None,
        actions: Optional[jax.Array] = None,
        states: Optional[jax.Array] = None,
        prior_eps: Optional[jax.Array] = None,
        use_prior_z: Optional[jax.Array] = None,
        output_aux: bool = False,
    ) -> Dict[str, jax.Array]:
        hp = self.hparams
        b, t, hgt, wid, c = images.shape
        num_scales = generator_num_scales(hgt, wid)

        cell = SAVPCell(hparams=hp, num_scales=num_scales, dtype=self.dtype)

        rnn_states = cell.init_rnn_states(b, hgt, wid, self.dtype or images.dtype)
        if hp.learn_initial_state:
            # learned init states (reference ``learn_initial_state`` hparam):
            # one [1,h,w,f] param per state leaf, broadcast over batch
            def learned(i, leaf):
                p = self.param(
                    f"init_state_{i}",
                    nn.initializers.zeros,
                    (1,) + leaf.shape[1:],
                    jnp.float32,
                )
                return jnp.broadcast_to(p.astype(leaf.dtype), leaf.shape)

            flat, treedef = jax.tree_util.tree_flatten(rnn_states)
            rnn_states = jax.tree_util.tree_unflatten(
                treedef, [learned(i, leaf) for i, leaf in enumerate(flat)]
            )
        last_images0 = jnp.repeat(images[:, :1], hp.last_frames, axis=1)
        state0 = states[:, 0] if (hp.use_states and states is not None) else None
        carry0 = (rnn_states, images[:, 0], last_images0, state0)

        first_image = images[:, 0]

        # time-major xs for the scan
        xs: Dict[str, jax.Array] = {
            "image": jnp.moveaxis(images[:, :-1], 1, 0),  # [T-1,B,H,W,C]
            "use_gt": use_gt,  # [T-1,B]
            "first_image": jnp.broadcast_to(first_image[None], (t - 1,) + first_image.shape),
        }
        if hp.context_images_background:
            ctx = images[:, : hp.context_frames]  # [B,ctx,H,W,C]
            xs["context_images"] = jnp.broadcast_to(ctx[None], (t - 1,) + ctx.shape)
        if zs is not None and hp.nz > 0:
            xs["z"] = jnp.moveaxis(zs, 1, 0)
        if actions is not None:
            xs["action"] = jnp.moveaxis(actions[:, : t - 1], 1, 0)
        if hp.use_states and states is not None:
            # per-step GT states, gated in-cell by the scheduled-sampling
            # mask (reference SAVPCell state conditioning); the rolled-out
            # prediction carries otherwise
            xs["state"] = jnp.moveaxis(states[:, : t - 1], 1, 0)
        if hp.learn_prior and hp.nz > 0:
            if prior_eps is None:
                prior_eps = jnp.zeros((b, t - 1, hp.nz), jnp.float32)
            xs["prior_eps"] = jnp.moveaxis(prior_eps, 1, 0)
            if zs is not None:
                upz = (
                    use_prior_z
                    if use_prior_z is not None
                    else jnp.zeros((b,), bool)  # external zs win by default
                )
                xs["use_prior_z"] = jnp.broadcast_to(upz[None], (t - 1, b))

        if hp.remat:
            if hp.remat_policy == "names":
                # selective remat: save the annotated conv/rnn outputs, so
                # the backward recomputes only elementwise chains — the MXU
                # work runs once (r2 VERDICT perf lever a)
                policy = jax.checkpoint_policies.save_only_these_names("savp_saveable")
            elif hp.remat_policy == "full":
                policy = None  # recompute the whole cell (min memory)
            else:
                raise ValueError(f"unknown remat_policy {hp.remat_policy!r}")
            # prevent_cse=False at scan_unroll=0 lets XLA CSE the remat away
            # (no recompute, max memory — OOMs past ~batch 48);
            # remat_prevent_cse=True keeps the barrier so full unroll stays
            # memory-bounded at large batch (see hparams)
            body = nn.remat(
                _cell_step, prevent_cse=hp.remat_prevent_cse, policy=policy
            )
        else:
            body = _cell_step
        # scan_unroll=0 -> fully unroll the time loop: XLA then fuses and
        # pipelines across timesteps (measured 1.7x at batch 16, see
        # ARCHITECTURE.md perf notes); remat still bounds activation memory
        unroll = (t - 1) if hp.scan_unroll == 0 else hp.scan_unroll
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
            unroll=unroll,
        )
        carry, outs = scan(cell, carry0, xs)

        result = {"gen_images": jnp.moveaxis(outs["gen_image"], 0, 1)}
        if "gen_state" in outs:
            result["gen_states"] = jnp.moveaxis(outs["gen_state"], 0, 1)
        for k in ("prior_mu", "prior_logvar", "z_used"):
            if k in outs:
                result[k] = jnp.moveaxis(outs[k], 0, 1)
        if output_aux:
            for k in ("masks", "kernels", "flows"):
                if k in outs:
                    result[k] = jnp.moveaxis(outs[k], 0, 1)
        return result


def _cell_step(cell: SAVPCell, carry, x):
    return cell(carry, x)


def _static_log2(n: int) -> int:
    k = 0
    while (1 << (k + 1)) <= n:
        k += 1
    return k


def generator_num_scales(height: int, width: int) -> int:
    """Encoder/decoder scale count for a given input resolution: bottleneck
    at 8x8 — 3 scales for 64px inputs, 4 for 128px, >=1 always.

    The single source of truth for the generator's downsample depth:
    ``SAVPGenerator.__call__`` builds the cell with it, and
    ``parallel/mesh.py#validate_spatial_mesh`` derives the spatial-shard
    bottleneck extent from it (keeping the guard from silently validating
    a different architecture if this rule ever changes)."""
    return max(1, min(4, _static_log2(min(height, width)) - 3))
