import glob
import os

from fmov_pose_tpu.data import hocon

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_all_confs():
    confs = glob.glob(os.path.join(REPO, "confs", "*.conf"))
    assert len(confs) >= 7
    for path in confs:
        conf = hocon.parse_file(path, {"CASE_NAME": "AP13_ori", "DATA_SET": "HO3D"})
        assert conf.get_float("train.learning_rate") == 5e-4
        assert conf.get_int("model.neus_renderer.n_samples") in (32, 64)
        assert "AP13_ori" in conf.get_string("dataset.data_dir")


def test_virtual_conf_values():
    conf = hocon.parse_file(
        os.path.join(REPO, "confs", "ho3d_virtual.conf"), {"CASE_NAME": "X"})
    assert conf.get_bool("dataset.crop") is True
    assert conf.get_bool("dataset.mask_init") is True
    assert conf.get_int("train.end_iter") == 300000
    assert conf.get_int("train.batch_size") == 512
    assert conf.get_float("train.igr_weight") == 0.1
    assert conf.get_float("train.mask_weight") == 5
    assert conf.get_float("train.flow_weight") == 0.1
    assert conf.get("model.pose_type") == "seg"
    assert conf.get_bool("model.barf") is True
    assert conf.get_int("model.sdf_network.d_in") == 3  # quoted key
    assert conf.get_list("model.sdf_network.skip_in") == [4]
    assert conf.get_int("model.nerf.D") == 8  # trailing commas
    assert conf.get_bool("model.nerf.use_viewdirs") is True
    assert conf.get_int("model.neus_renderer.up_sample_steps") == 4  # inline comment
    assert conf.get_list("general.recording") == ["./", "./fmov_pose_tpu"]


def test_tpu_fast_presets_differ_only_by_switches():
    """The *_tpu_fast.conf presets must be the shipped confs plus exactly
    the two opt-in performance switches (no silent model/loss drift)."""
    import re
    for base, fast in (("ho3d_virtual.conf", "ho3d_virtual_tpu_fast.conf"),
                       ("ho3d_global_womask.conf",
                        "ho3d_global_womask_tpu_fast.conf"),
                       ("ml_virtual.conf", "ml_virtual_tpu_fast.conf"),
                       ("ml_global_womask.conf",
                        "ml_global_womask_tpu_fast.conf")):
        def strip(path):
            lines = []
            for line in open(os.path.join(REPO, "confs", path)):
                line = re.sub(r"#.*", "", line).strip()
                if line:
                    lines.append(line)
            return lines
        extra = [l for l in strip(fast) if l not in strip(base)]
        assert extra == ["use_fused_train_kernels = True",
                         "occupancy_sampling = True"], (fast, extra)
        missing = [l for l in strip(base) if l not in strip(fast)]
        assert missing == [], (fast, missing)
        conf = hocon.parse_file(os.path.join(REPO, "confs", fast),
                                {"CASE_NAME": "X"})
        assert conf.get_bool("train.use_fused_train_kernels") is True
        assert conf.get_bool("train.occupancy_sampling") is True


def test_defaults_and_put():
    conf = hocon.parse_string("a { b = 1 }")
    assert conf.get_int("a.b") == 1
    assert conf.get("a.missing", 7) == 7
    assert conf.get_bool("a.nope", False) is False
    conf.put("a.c.d", 3)
    assert conf.get_int("a.c.d") == 3
    assert "a.b" in conf
    assert "a.zzz" not in conf


def test_scientific_and_strings():
    conf = hocon.parse_string(
        "t { lr = 5e-4\n name = idr\n path = ./data/X/\n flag = False }")
    assert conf.get_float("t.lr") == 5e-4
    assert conf.get("t.name") == "idr"
    assert conf.get("t.path") == "./data/X/"
    assert conf.get_bool("t.flag") is False
