"""Compatibility entry point mirroring the reference training_plot.py script."""

from vbt_tpu.cli.training_plot import main

if __name__ == "__main__":
    main()
