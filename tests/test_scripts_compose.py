"""Every run script's Hydra override block must compose through the config
loader (VERDICT r2 #8: scripts double as config-coverage tests)."""

import os
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SCRIPTS = sorted(
    list((REPO / "scripts" / "unsupervised").glob("train_*.sh"))
    + list((REPO / "scripts" / "scannet").glob("*.sh"))
    + list((REPO / "scripts" / "eval").glob("*.sh"))
)

ENV_SUBST = {
    "EXP_NAME": "smoke", "EXTRA_ARGS": "", "DATASET_NAME": "unscene3d_dino",
    "DATA_DIR": "data/processed/unscene3d_dino",
    "VAL_DATA_DIR": "data/processed/scannet_freemask_oracle",
    "CKPT": "saved/smoke", "DS": "scannet_freemask_oracle",
    "ROUND": "1", "PREV": "saved/prev",
}


def _override_blocks(text: str):
    """Extract the override args of each `python main_instance_segmentation.py`
    invocation (joining backslash-continued lines)."""
    text = text.replace("\\\n", " ")
    blocks = []
    for line in text.split("\n"):
        line = line.strip()
        if line.startswith("#") or "main_instance_segmentation.py" not in line:
            continue
        args = line.split("main_instance_segmentation.py", 1)[1]
        for var, val in ENV_SUBST.items():
            args = args.replace("${%s}" % var, val).replace("$%s" % var, val)
        args = re.sub(r"\$\{[A-Za-z_]+:-([^}]*)\}", r"\1", args)
        args = re.sub(r"\$\{?[A-Za-z_]+\}?", "", args)
        toks = [t for t in args.split() if "=" in t]
        if toks:
            blocks.append(toks)
    return blocks


@pytest.mark.parametrize("script", SCRIPTS, ids=lambda p: p.name)
def test_script_overrides_compose(script):
    from main_instance_segmentation import get_parameters

    blocks = _override_blocks(script.read_text())
    if not blocks:
        pytest.skip("no train-app invocation in script")
    os.chdir(REPO)
    for overrides in blocks:
        cfg = get_parameters(overrides)
        assert cfg.general is not None
        # every `a.b=c` override must have landed
        for tok in overrides:
            key = tok.split("=", 1)[0]
            if key.startswith(("data/", "optimizer", "scheduler", "model/",
                               "loss", "matcher", "trainer/")):
                continue  # group selections, not keys
            node = cfg
            ok = True
            for part in key.split("."):
                try:
                    node = node[part] if not hasattr(node, part) else getattr(node, part)
                except Exception:
                    ok = False
                    break
            assert ok, f"{script.name}: override key {key} missing from config"
