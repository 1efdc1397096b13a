import textwrap

from patchperpix_tpu import config as cfg


def test_merge_and_load(tmp_path):
    a = tmp_path / "a.toml"
    b = tmp_path / "b.toml"
    a.write_text(textwrap.dedent("""
        [model]
        patchshape = [7, 7, 7]
        num_fmaps = 20
        [training]
        max_iterations = 400002
    """))
    b.write_text(textwrap.dedent("""
        [model]
        num_fmaps = 32
        [vote_instances]
        patch_threshold = 0.5
    """))
    c = cfg.load_config(a, b)
    assert c["model"]["patchshape"] == [7, 7, 7]
    assert c["model"]["num_fmaps"] == 32
    assert c["vote_instances"]["patch_threshold"] == 0.5


def test_dump_roundtrip(tmp_path):
    c = {"general": {"debug": False, "logging": "INFO"},
         "model": {"patchshape": [1, 25, 25], "lr": 1e-4},
         "training": {"augmentation": {"elastic": {"subsample": 4}}}}
    p = tmp_path / "out.toml"
    cfg.dump_config(c, p)
    c2 = cfg.load_config(p)
    assert c2 == c


def test_paths_and_flatten():
    c = {"a": {"b": {"c": 3}}, "model": {"x": 1}, "vote_instances": {"x": 2, "y": 5}}
    assert cfg.get_by_path(c, "a.b.c") == 3
    assert cfg.get_by_path(c, "a.b.missing", 7) == 7
    cfg.set_by_path(c, "a.b.d", 9)
    assert c["a"]["b"]["d"] == 9
    flat = cfg.flatten_for_stage(c, "model", "vote_instances")
    assert flat == {"x": 2, "y": 5}


def test_named_params_grid():
    section = {
        "params_product": ["mws", "skel"],
        "params_zip": ["patch_threshold", "fc_threshold"],
        "mws": [False, True],
        "skel": [True],
        "patch_threshold": [0.5, 0.8],
        "fc_threshold": [0.5, 0.8],
    }
    grids = cfg.named_params(section)
    assert len(grids) == 4  # 2 (mws) x 1 (skel) x 2 (zipped)
    assert {"mws": False, "skel": True,
            "patch_threshold": 0.5, "fc_threshold": 0.5} in grids
    assert {"mws": True, "skel": True,
            "patch_threshold": 0.8, "fc_threshold": 0.8} in grids
