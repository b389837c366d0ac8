"""YAML option files (basicsr/utils/options.py semantics).

BasicSR drives every training/test run from a ``-opt *.yml`` file; the
same config files work here: ``parse_options`` loads the yml, stamps
phase/scale onto each dataset block, and lays out the experiment
directory tree.  The torch-distributed/argparse plumbing of the
reference is replaced by explicit function arguments (device counts
come from ``jax.devices()`` at the call site).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import yaml


def ordered_yaml_load(stream) -> Dict[str, Any]:
    """options.py:12-34 ordered load; Python dicts preserve insertion
    order, so SafeLoader suffices."""
    return yaml.load(stream, Loader=yaml.SafeLoader)


def yaml_load(path_or_str: str) -> Dict[str, Any]:
    """Load a yml file path, or parse a yml string (basicsr
    utils.options.yaml_load)."""
    if path_or_str.endswith((".yml", ".yaml")):
        with open(path_or_str) as f:
            return ordered_yaml_load(f)
    return ordered_yaml_load(path_or_str)


def dict2str(opt: Dict[str, Any], indent_level: int = 1) -> str:
    """Printable option tree (options.py:37-56)."""
    msg = "\n"
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_level * 2) + k + ":["
            msg += dict2str(v, indent_level + 1)
            msg += " " * (indent_level * 2) + "]\n"
        else:
            msg += " " * (indent_level * 2) + k + ": " + str(v) + "\n"
    return msg


def postprocess_yml_value(value: str):
    """CLI-override literal parsing (options.py:58-79)."""
    if value == "~" or value.lower() == "none":
        return None
    if value.lower() == "true":
        return True
    if value.lower() == "false":
        return False
    if value.startswith("!!float"):
        return float(value.replace("!!float", ""))
    if value.isdigit():
        return int(value)
    if value.replace(".", "", 1).isdigit() and value.count(".") < 2:
        return float(value)
    if value.startswith("["):
        return yaml.safe_load(value)
    return value


def apply_force_yml(opt: Dict[str, Any], force_yml: List[str]) -> None:
    """Apply ``section:key=value`` overrides in place
    (options.py:116-128; existing keys only)."""
    for entry in force_yml:
        keys, value = entry.split("=", 1)
        value = postprocess_yml_value(value.strip())
        node = opt
        parts = [k.strip() for k in keys.strip().split(":")]
        for k in parts[:-1]:
            node = node[k]
        if parts[-1] not in node:
            raise KeyError(f"force_yml key {keys!r} not in options")
        node[parts[-1]] = value


def parse_options(opt_path: str, root_path: str = ".",
                  is_train: bool = True,
                  force_yml: Optional[List[str]] = None,
                  debug: bool = False) -> Dict[str, Any]:
    """options.py:82-177 without the launcher/dist/argparse plumbing."""
    opt = yaml_load(opt_path)
    if force_yml:
        apply_force_yml(opt, force_yml)
    opt["is_train"] = is_train
    if debug and not opt["name"].startswith("debug"):
        opt["name"] = "debug_" + opt["name"]

    for phase_key, dataset in (opt.get("datasets") or {}).items():
        phase = phase_key.split("_")[0]
        dataset["phase"] = phase
        if "scale" in opt:
            dataset["scale"] = opt["scale"]
        for k in ("dataroot_gt", "dataroot_lq"):
            if dataset.get(k) is not None:
                dataset[k] = os.path.expanduser(dataset[k])

    opt.setdefault("path", {})
    for key, val in opt["path"].items():
        if val is not None and ("resume_state" in key
                                or "pretrain_network" in key):
            opt["path"][key] = os.path.expanduser(val)

    if is_train:
        experiments_root = os.path.join(root_path, "experiments", opt["name"])
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = os.path.join(experiments_root, "models")
        opt["path"]["training_states"] = os.path.join(
            experiments_root, "training_states")
        opt["path"]["log"] = experiments_root
        opt["path"]["visualization"] = os.path.join(
            experiments_root, "visualization")
        if "debug" in opt["name"]:
            if "val" in opt:
                opt["val"]["val_freq"] = 8
            opt.setdefault("logger", {})
            opt["logger"]["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = os.path.join(root_path, "results", opt["name"])
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root
        opt["path"]["visualization"] = os.path.join(
            results_root, "visualization")
    return opt
