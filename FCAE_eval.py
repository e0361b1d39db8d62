"""Flow-autoencoder reconstruction evaluation: angular/endpoint error sweep
(reference ``FCAE_eval.py:14-26``).

    python FCAE_eval.py --config <flow_encoder_fc cfg> --model_name <name> \
        --data_root <dir>
"""
import argparse
import json

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--model_name", required=True)
    p.add_argument("--data_root", default=None)
    p.add_argument("--n_batches", type=int, default=20)
    args = p.parse_args()

    import main as cli
    from ipoke_tpu.cli.experiments import select_experiment
    from ipoke_tpu.cli.testing import _restore_trained
    from ipoke_tpu.eval import optical_flow_metrics

    config, dirs, data_root = cli.load_parameters(argparse.Namespace(
        config=args.config, model_name=args.model_name, test="samples",
        resume=False, last_ckpt=False, target_version=None,
        data_root=args.data_root or None, debug=False, devices=None,
        gpus=None))
    exp = select_experiment(config)(config, dirs, data_root=data_root)
    _restore_trained(exp, require_sampler=False)

    import jax

    apply = jax.jit(lambda p, x, r: exp.model.apply({"params": p}, x, rng=r))
    agg = {}
    for batch in exp.datamodule.test_loader(n_batches=args.n_batches):
        x = jnp.asarray(batch["flow"])
        rec, *_ = apply(exp.state.params, x, exp.next_rng())
        for k, v in optical_flow_metrics(x, rec).items():
            agg.setdefault(k, []).append(float(v))
    result = {k: float(np.mean(v)) for k, v in agg.items()}
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
