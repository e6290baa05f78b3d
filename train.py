"""Compatibility entry point mirroring the reference train.py script."""

from vbt_tpu.cli.train import main

if __name__ == "__main__":
    main()
