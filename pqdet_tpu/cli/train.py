"""Training CLI (reference trainer.py:370-384).

    python -m pqdet_tpu.cli.train --yaml yamls/voc.yaml [key value ...]
"""

import argparse

from pqdet_tpu.config import load_config
from pqdet_tpu.train.trainer import Trainer
from pqdet_tpu.utils.debug import register_stack_dump


def main():
    register_stack_dump()
    parser = argparse.ArgumentParser(description='trainer configuration')
    parser.add_argument('--yaml', default=None)
    args, rest = parser.parse_known_args()
    args.opts = rest  # trailing config overrides: key value [...]
    cfg = load_config(args.yaml, args.opts)
    print(cfg)
    Trainer(cfg).run()


if __name__ == '__main__':
    main()
