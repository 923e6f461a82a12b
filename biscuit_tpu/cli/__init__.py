"""CLI scripts: the L5 reproduction surface plus the deployment loop.

Equivalents of the reference repo-root scripts configure.py / train.py /
results.py (SURVEY.md §1 L5), plus the serving commands (no reference
counterpart — the reference re-imports its stack per process), invokable
as::

    python -m biscuit_tpu.cli.configure --help
    python -m biscuit_tpu.cli.train --help
    python -m biscuit_tpu.cli.results --help
    python -m biscuit_tpu.cli.export --help        # model dir -> servable
    python -m biscuit_tpu.cli.predict --help       # servable -> CSVs
    python -m biscuit_tpu.cli.import_model --help  # Keras export -> model dir
"""
