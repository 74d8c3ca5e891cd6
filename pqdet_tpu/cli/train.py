"""Training CLI (reference trainer.py:370-384).

    python -m pqdet_tpu.cli.train --yaml yamls/voc.yaml [key value ...]
"""

import argparse
import faulthandler
import io
import signal

from pqdet_tpu.config import load_config
from pqdet_tpu.train.trainer import Trainer


def main():
    # `kill -USR1 <pid>` dumps all thread stacks to stderr — the one
    # diagnostic channel for a wedged run on the axon tunnel. (pytest
    # captures stderr as a file-less buffer; skip silently there.)
    try:
        faulthandler.register(signal.SIGUSR1)
    except (io.UnsupportedOperation, ValueError, AttributeError):
        pass
    parser = argparse.ArgumentParser(description='trainer configuration')
    parser.add_argument('--yaml', default=None)
    args, rest = parser.parse_known_args()
    args.opts = rest  # trailing config overrides: key value [...]
    cfg = load_config(args.yaml, args.opts)
    print(cfg)
    Trainer(cfg).run()


if __name__ == '__main__':
    main()
