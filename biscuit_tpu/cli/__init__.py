"""CLI reproduction scripts (L5): configure, train, results.

Equivalents of the reference repo-root scripts configure.py / train.py /
results.py (SURVEY.md §1 L5), invokable as::

    python -m biscuit_tpu.cli.configure --help
    python -m biscuit_tpu.cli.train --help
    python -m biscuit_tpu.cli.results --help
"""
