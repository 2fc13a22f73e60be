#!/usr/bin/env python
"""Boosted-regressor downstream probe (reference src/saprot_fit_reg.py)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from saprot_fit_cls import main  # noqa: E402

if __name__ == "__main__":
    main(regression=True, config_name="saprot_sweep_xgboost_reg.yaml")
