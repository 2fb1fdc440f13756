#!/usr/bin/env python
"""Train driver: python train.py -c cfgs/<model>.yaml
(reference surface: registration/train.py, completion/train.py)."""

from houv_tpu.train.cli import train_main

if __name__ == "__main__":
    train_main()
