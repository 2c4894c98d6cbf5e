"""Config zoo drift guard: the checked-in YAMLs must match what
scripts/gen_configs.py generates (single source of truth)."""
import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "rtfs_net_tpu", "configs")


def test_configs_match_generator(tmp_path, monkeypatch):
    import gen_configs

    monkeypatch.setattr(gen_configs, "OUT", str(tmp_path))
    gen_configs.main()
    for name in os.listdir(CONFIG_DIR):
        if not name.endswith(".yaml"):
            continue
        with open(os.path.join(CONFIG_DIR, name)) as f:
            checked_in = yaml.safe_load(f)
        with open(tmp_path / name) as f:
            generated = yaml.safe_load(f)
        assert checked_in == generated, f"{name} drifted from gen_configs.py"
