"""YAML <-> script consistency checking.

Parity target: reference ``utils/check_yaml.py:129``: verifies that
every variable declared in a recipe YAML is actually used by its train
script (catching dead hyperparameters and typos).
"""

import os
import re

__all__ = ["get_yaml_var", "detect_script_vars", "check_yaml_vs_script"]


def get_yaml_var(hparam_file):
    """Top-level variable names declared in a YAML file."""
    var_lst = []
    with open(hparam_file) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            m = re.match(r"^([A-Za-z_][\w]*)\s*:", line)
            if m:
                var_lst.append(m.group(1))
    return var_lst


def detect_script_vars(script_file, var_lst):
    """Which of var_lst appear used in the script."""
    with open(script_file) as f:
        text = f.read()
    detected = []
    for var in var_lst:
        patterns = [
            f'hparams["{var}"]',
            f"hparams['{var}']",
            f"hparams.{var}",
            f'attr["{var}"]',
            f"self.hparams.{var}",
            f'hparams.get("{var}"',
            f"hparams.get('{var}'",
        ]
        if any(p in text for p in patterns):
            detected.append(var)
    return detected


def _extra_scripts(script_file):
    """Additional scripts a wrapper recipe delegates to, declared with
    ``# yaml-check-extra-script: <repo-relative path>`` comments (used
    by e.g. the Voicebank dereverb recipes that reuse the enhance
    Brains)."""
    import re

    with open(script_file) as f:
        text = f.read()
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    out = []
    for rel in re.findall(r"#\s*yaml-check-extra-script:\s*(\S+)", text):
        path = os.path.join(repo, rel)
        if os.path.exists(path):
            out.append(path)
    return out


def check_yaml_vs_script(hparam_file, script_file, ignore=()):
    """True if every YAML var is used by the script (or internally).

    A var is "internally used" if referenced by another YAML line via
    ``!ref <var>`` — those don't need script usage.
    """
    var_lst = get_yaml_var(hparam_file)
    with open(hparam_file) as f:
        yaml_text = f.read()
    internally_used = set()
    for var in var_lst:
        if f"<{var}>" in yaml_text or f"<{var}[" in yaml_text:
            internally_used.add(var)
    detected = set(detect_script_vars(script_file, var_lst))
    for extra in _extra_scripts(script_file):
        detected |= set(detect_script_vars(extra, var_lst))
    unused = [
        v
        for v in var_lst
        if v not in detected
        and v not in internally_used
        and v not in ignore
    ]
    if unused:
        print(
            f"ERROR: unused variables in {hparam_file}: {unused} "
            f"(not referenced by {script_file})"
        )
        return False
    return True
