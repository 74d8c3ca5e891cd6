"""NAS search CLI (reference nas/search.py).

    python -m pqdet_tpu.cli.search --yaml exp.yaml --rounds 50 \
        --max-macs 5e9 [--max-latency-ms 20] [--log nas_search.json]
"""

import argparse


def main():
    from pqdet_tpu.utils.debug import register_stack_dump
    register_stack_dump()
    parser = argparse.ArgumentParser(description='random NAS search')
    parser.add_argument('--yaml', default=None)
    parser.add_argument('--rounds', type=int, default=50)
    parser.add_argument('--max-macs', type=float, default=5e9)
    parser.add_argument('--max-latency-ms', type=float, default=None)
    parser.add_argument('--log', default='nas_search.json')
    parser.add_argument('--seed', type=int, default=None,
                        help='candidate-sampler seed (reproducible search)')
    parser.add_argument('--exp-cap', type=float, default=40.0,
                        help='decode exp clamp written into candidate '
                             'yolo sections (0 = bare exp, reference '
                             'semantics; see model/decode.py)')
    args, rest = parser.parse_known_args()

    from pqdet_tpu.config import load_config
    from pqdet_tpu.nas.search import search
    cfg = load_config(args.yaml, rest)
    search(cfg, rounds=args.rounds, max_macs=args.max_macs,
           log_path=args.log, max_latency_ms=args.max_latency_ms,
           seed=args.seed, exp_cap=args.exp_cap)


if __name__ == '__main__':
    main()
