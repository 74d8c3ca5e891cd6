"""Hyper-parameter evolution CLI (reference evolute.py:141-155).

    python -m pqdet_tpu.cli.evolute --yaml exp.yaml --rounds 200 \
        [--log evolution.json]
"""

import argparse


def main():
    import faulthandler
    faulthandler.enable()  # a segfault/abort prints thread stacks instead
    # of the round-4 silent exit at round 13/16
    from pqdet_tpu.utils.debug import register_stack_dump
    register_stack_dump()
    parser = argparse.ArgumentParser(description='hyper evolution')
    parser.add_argument('--yaml', default=None)
    parser.add_argument('--rounds', type=int, default=200)
    parser.add_argument('--log', default='evolution.json')
    parser.add_argument('--seed', type=int, default=None)
    args, rest = parser.parse_known_args()

    from pqdet_tpu.config import load_config
    from pqdet_tpu.nas.evolute import Evoluter
    cfg = load_config(args.yaml, rest)
    Evoluter(cfg, rounds=args.rounds, log_path=args.log,
             seed=args.seed).run()


if __name__ == '__main__':
    main()
