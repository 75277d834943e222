#!/usr/bin/env python
"""Dump a fully-resolved experiment config (reference tools/print_config.py).

Usage: python tools/print_config.py <config-name> [--options ...]
"""
import argparse
import dataclasses
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--options", nargs="*", default=None)
    args = parser.parse_args()

    from gedepth_tpu.configs import get_config
    from tools.train import apply_options

    cfg = apply_options(get_config(args.config), args.options)
    print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))


if __name__ == "__main__":
    main()
