"""Train the learned model zoo online on the TPU, sequentially.

Usage: python scripts/train_zoo.py --models admm4 admm2 tikhonet --steps 15000
"""

import argparse
import logging
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


# key -> (run name, model kind, model kwargs, loss name)
SPECS = {
    "admm8": ("Gaussian_PnP_ADMM_8iters_MultiScale", "admm", dict(n_iters=8), "MultiScale"),
    "admm4": ("Gaussian_PnP_ADMM_4iters_MultiScale", "admm", dict(n_iters=4), "MultiScale"),
    "admm2": ("Gaussian_PnP_ADMM_2iters_MultiScale", "admm", dict(n_iters=2), "MultiScale"),
    "tikhonet": ("Tikhonet_Laplacian_MultiScale", "tikhonet", dict(filter="Laplacian"), "MultiScale"),
    # ShapeNet = Tikhonet trained with the shape-constraint loss
    # (reference train.py:44-45,58-59)
    "shapenet": ("ShapeNet_Laplacian", "tikhonet", dict(filter="Laplacian"), "Shape"),
    # flagship trained with the shape-constraint loss (any --loss combines
    # with any --model in the reference CLI, train.py:58-74)
    "admm8_shape": ("Gaussian_PnP_ADMM_8iters_Shape", "admm", dict(n_iters=8), "Shape"),
    # mirrors the reference's shipped results/Unrolled_ADMM_Gaussian(4)_Shape
    "admm4_shape": ("Gaussian_PnP_ADMM_4iters_Shape", "admm", dict(n_iters=4), "Shape"),
    "admm8_moment": ("Gaussian_PnP_ADMM_8iters_MomentBased", "admm", dict(n_iters=8), "MomentBasedLoss"),
    # the reference's committed MomentBased training log is ADMM(2)
    # (train_output_20250305_195425.txt); BestEllipse has no reference
    # artifact — same cheap depth so the L4 losses all get a trained row
    "admm2_moment": ("Gaussian_PnP_ADMM_2iters_MomentBased", "admm", dict(n_iters=2), "MomentBasedLoss"),
    "admm2_ellipse": ("Gaussian_PnP_ADMM_2iters_BestEllipse", "admm", dict(n_iters=2), "BestEllipse"),
    # Poisson-likelihood two-dual ADMM (reference models/Unrolled_ADMM.py —
    # eval-alive in test.py:42-44; train-dead there, trainable here)
    "poisson8": ("Poisson_PnP_ADMM_8iters_MultiScale", "admm_poisson", dict(n_iters=8), "MultiScale"),
    "resunet": ("ResUNet_MultiScale", "resunet", {}, "MultiScale"),
    # unit-scale denoiser: trained on stamps divided by alpha, matching the
    # scale of ADMMNet's loop variable (simulate_batch_denoise_unit docstring)
    "resunet_unit": ("ResUNet_Unit_MultiScale", "resunet_unit", {}, "MultiScale"),
    # bounded-rho schedule variants: every unrolled iteration's penalty is
    # kept in [0.1, 10] log-space (see UnrolledADMMGaussian.rho_bounds),
    # countering the orders-of-magnitude-non-uniform schedule the
    # unconstrained SubNet converges to under long online training
    # (measured: figures/rho_schedule.json; RESULTS.md "The SubNet rho
    # schedule")
    "admm8_bounded": ("Gaussian_PnP_ADMM_8iters_Bounded_MultiScale", "admm",
                      dict(n_iters=8, rho_bounds=(0.1, 10.0)), "MultiScale"),
    "admm4_bounded": ("Gaussian_PnP_ADMM_4iters_Bounded_MultiScale", "admm",
                      dict(n_iters=4, rho_bounds=(0.1, 10.0)), "MultiScale"),
    "admm2_bounded": ("Gaussian_PnP_ADMM_2iters_Bounded_MultiScale", "admm",
                      dict(n_iters=2, rho_bounds=(0.1, 10.0)), "MultiScale"),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="+", default=["admm4", "admm2"], choices=list(SPECS))
    parser.add_argument("--steps", type=int, default=15000)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--save_path", default="saved_models_online")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--steps_per_call", type=int, default=10,
                        help="train steps fused into one lax.scan'd XLA call")
    parser.add_argument(
        "--init_from", default=None,
        help="checkpoint dir ({params, batch_stats} pytree, e.g. trained/<run>_<N>epochs) "
             "to warm-start the FIRST model in --models (continuation training)")
    parser.add_argument(
        "--suffix", default="",
        help="appended to every run name (e.g. _cont), keeping continuation "
             "checkpoints separate from the original run's")
    parser.add_argument("--snr_min", type=float, default=None,
                        help="override SimulationConfig.snr_min for the training SNR distribution")
    parser.add_argument("--snr_max", type=float, default=None,
                        help="override SimulationConfig.snr_max")
    parser.add_argument("--snr_power", type=float, default=None,
                        help="override SimulationConfig.snr_power (p(snr) ∝ snr^-power; "
                             "larger = more low-SNR emphasis, 1.0 = log-uniform)")
    parser.add_argument("--flux_norm_loss", action="store_true",
                        help="per-sample flux normalization in the MultiScale loss "
                             "(equal gradient weight for faint/low-SNR stamps)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    import jax
    import numpy as np

    from galaxy_deconv_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from galaxy_deconv_tpu.data.simulate import SimulationConfig, simulate_batch, simulate_batch_denoise
    from galaxy_deconv_tpu.losses import build_loss
    from galaxy_deconv_tpu.models import ResUNetDenoiser, Tikhonet, UnrolledADMM, UnrolledADMMGaussian
    from galaxy_deconv_tpu.train import create_train_state
    from galaxy_deconv_tpu.train.online import fit_online
    from galaxy_deconv_tpu.train.state import default_optimizer
    from galaxy_deconv_tpu.utils.watchdog import StallWatchdog

    # fit_online's own watchdog only covers the training loop; the init
    # path (first simulate_batch + model init) is also a device call that
    # has been observed to wedge — cover it here and hand off at fit time.
    # 600s: the ResUNet models init+compile in ~90s, but the XDenseUNet
    # models (tikhonet/shapenet — DenseBlocks of many small convs) can
    # legitimately take several minutes to compile over the tunneled
    # backend; a 300s fuse was observed killing healthy tikhonet inits
    # (round-3 log, rc=75 on 4 consecutive attempts).
    init_dog = StallWatchdog(600.0, name="train_zoo[init]").start()

    overrides = {
        k: getattr(args, k)
        for k in ("snr_min", "snr_max", "snr_power")
        if getattr(args, k) is not None
    }
    cfg = SimulationConfig(**overrides)
    if overrides:
        print(f"simulation overrides: {overrides}")
    for key in args.models:
        name, kind, kw, loss_name = SPECS[key]
        name += args.suffix
        if kind == "admm":
            model = UnrolledADMMGaussian(features=(32, 64, 128, 256), **kw)
            sampler = simulate_batch
        elif kind == "admm_poisson":
            # reference denoiser widths nc=[64,128,256,512] (models/Unrolled_ADMM.py:131-139)
            model = UnrolledADMM(llh="Poisson", **kw)
            sampler = simulate_batch
        elif kind == "tikhonet":
            model = Tikhonet(**kw)
            sampler = simulate_batch
        elif kind == "resunet_unit":
            from galaxy_deconv_tpu.data.simulate import simulate_batch_denoise_unit

            model = ResUNetDenoiser()
            sampler = simulate_batch_denoise_unit
        else:
            model = ResUNetDenoiser()
            sampler = simulate_batch_denoise

        sample = jax.tree.map(np.asarray, sampler(jax.random.PRNGKey(0), 2, cfg))
        sample["alpha"] = sample["obs"].mean(axis=(1, 2))
        optimizer = default_optimizer(args.lr, schedule="cosine", total_steps=args.steps)
        state, optimizer = create_train_state(model, jax.random.PRNGKey(0), sample, optimizer)
        if args.init_from and key == args.models[0]:
            import orbax.checkpoint as ocp

            with ocp.PyTreeCheckpointer() as ckptr:
                warm = ckptr.restore(str(pathlib.Path(args.init_from).resolve()))
            state = state.replace(
                params=jax.tree.map(np.asarray, warm["params"]),
                batch_stats=jax.tree.map(np.asarray, warm.get("batch_stats", state.batch_stats)),
            )
            print(f"warm-started {name} from {args.init_from}")
        init_dog.stop()  # hand off to fit_online's own loop watchdog
        print(f"=== training {name} for {args.steps} steps ===")
        state, hist = fit_online(
            model, state, optimizer,
            build_loss(loss_name, **({"flux_normalize": True}
                                     if args.flux_norm_loss and loss_name == "MultiScale" else {})),
            n_steps=args.steps,
            batch_size=args.batch, sim_cfg=cfg, seed=args.seed, log_every=500, val_every=1000,
            model_name=name, save_path=args.save_path, save_every=args.steps,
            sampler=sampler, steps_per_call=args.steps_per_call,
        )
        init_dog = StallWatchdog(600.0, name="train_zoo[init]").start()
        val = hist["val_loss"]
        summary = f"final val={val[-1]:.5g} best={min(val):.5g}" if val else "no val evals (steps < val_every)"
        print(f"{name}: {summary} ({hist['galaxies_per_sec']:.0f} gal/s)")
    init_dog.stop()


if __name__ == "__main__":
    main()
