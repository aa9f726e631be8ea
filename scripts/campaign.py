"""Thin wrapper: the campaign runner lives in nmc_tpu.campaign
(also exposed as `python -m nmc_tpu campaign`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nmc_tpu.campaign import main

if __name__ == "__main__":
    main()
