"""Every shipped per-dataset TOML must build valid model + assembly
configs (catches schema drift between configs/ and the dataclasses)."""

import glob
import os

import numpy as np
import pytest

from patchperpix_tpu import config as cfglib
from patchperpix_tpu.assembly import VoteInstancesParams
from patchperpix_tpu.models import PPPConfig, PPPModel

CONFIGS = sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs", "*.toml")))


@pytest.mark.parametrize("path", CONFIGS,
                         ids=[os.path.basename(p) for p in CONFIGS])
def test_dataset_config_builds(path):
    cfg = cfglib.load_config(path)
    assert "model" in cfg and "vote_instances" in cfg

    mcfg = PPPConfig.from_config({**cfg["model"],
                                  "num_channels":
                                  cfg.get("data", {}).get("num_channels",
                                                          1)})
    model = PPPModel(mcfg)
    assert model is not None
    assert len(mcfg.patchshape) == 3

    vi = dict(cfg["vote_instances"])
    vi["patchshape"] = cfg["model"]["patchshape"]
    params = VoteInstancesParams.from_config(vi)
    assert params.patch_threshold > 0
    assert np.prod(params.patchshape) >= 1

    # every key in the TOML section must be a known param (no silent
    # typo-drift: unknown keys would be ignored by from_config)
    from dataclasses import fields

    known = {f.name for f in fields(VoteInstancesParams)}
    unknown = set(vi) - known
    assert not unknown, f"unknown [vote_instances] keys in {path}: {unknown}"
