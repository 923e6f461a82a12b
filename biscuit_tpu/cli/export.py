"""Servable-export CLI: saved model dir -> single-file AOT artifact.

No reference counterpart (the reference serves by re-importing the full
stack per process, /root/reference/results.py:234-257); this is the
command-line face of :mod:`biscuit_tpu.serve` for fleet deployment —
export once on a TPU build host, ship the artifact.

    python -m biscuit_tpu.cli.export MODEL_DIR [-o artifact] [-b 1024]
"""

from __future__ import annotations

import click

from ..utils_log import log


@click.command()
@click.argument("model_dir")
@click.option("-o", "--out", default=None,
              help="Artifact path (default MODEL_DIR/servable.biscuit).")
@click.option("-b", "--batch-size", default=1024, show_default=True,
              help="Static batch of the exported program (1024 is the "
                   "measured v5e throughput sweet spot; smaller for "
                   "latency-sensitive serving).")
@click.option("-k", default=None, type=int,
              help="MC-dropout samples (default: the model's hp.uq_samples).")
@click.option("--platform", "platforms", multiple=True,
              help="Lowering platform(s), e.g. --platform tpu --platform "
                   "cpu. Default: the exporting host's backend. Non-TPU "
                   "platforms require --no-fused on a TPU host.")
@click.option("--fused/--no-fused", "use_fused", default=None,
              help="Bake the fused Pallas TPU kernels (default: auto — "
                   "fused when exporting on a TPU host). --no-fused "
                   "exports portable pure-StableHLO.")
@click.option("--features/--no-features", "with_features", default=True,
              show_default=True,
              help="Also bake the feature program (trunk activations + "
                   "K-pass head) so UMAP mosaics run off the artifact.")
@click.option("--features-k", default=8, show_default=True, type=int,
              help="MC-dropout samples of the feature program's head.")
def main(model_dir, out, batch_size, k, platforms, use_fused,
         with_features, features_k):
    """Export MODEL_DIR (params.json + model.msgpack) to a servable."""
    from ..serve import export_servable

    path = export_servable(
        model_dir,
        out_path=out,
        batch_size=batch_size,
        k=k,
        platforms=platforms or None,
        use_fused=use_fused,
        with_features=with_features,
        features_k=features_k,
    )
    import os

    log.info(f"exported {path} ({os.path.getsize(path) / 1e6:.1f} MB)")
    click.echo(path)


if __name__ == "__main__":
    main()
