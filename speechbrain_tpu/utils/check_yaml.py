"""YAML <-> script consistency checking.

Parity target: reference ``utils/check_yaml.py:129``: verifies that
every variable declared in a recipe YAML is actually used by its train
script (catching dead hyperparameters and typos).
"""

import logging
import os
import re

logger = logging.getLogger(__name__)

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


def extract_patterns(lines, start_pattern, end_pattern):
    """Extract variable names appearing between ``start_pattern`` and
    any character of ``end_pattern`` (reference
    ``utils/check_yaml.py:196``).

    Example
    -------
    >>> extract_patterns(['x = hparams["lr"]'], 'hparams["', '"')
    ['lr']
    """
    var_lst = []
    for line in lines:
        start_indexes = [
            index
            for index in range(len(line))
            if line.startswith(start_pattern, index)
        ]
        for index in start_indexes:
            line_src = line[index + len(start_pattern):]
            var_name = ""
            for char in line_src:
                if char in end_pattern:
                    break
                var_name += char
            var_lst.append(var_name)
    return var_lst


def check_module_vars(
    hparam_file, script_file, module_key="modules:",
    module_var="self.modules.",
):
    """Check that every ``self.modules.<var>`` used in the script is
    declared under ``modules:`` in the yaml (reference
    ``utils/check_yaml.py:233``).  Returns True when consistent."""
    stop_char = [
        " ", ",", "(", ")", "[", "]", "{", "}", ".", ":", "\n",
    ]
    end_block = [" ", "\t"]
    avoid_lst = ["parameters", "keys", "eval", "train", "items", "values"]

    module_vars_hparams = []
    module_block = False
    with open(hparam_file) as f:
        for line in f:
            if module_key in line:
                module_block = True
                continue
            if line and line[0] not in end_block:
                module_block = False
            if module_block and line.strip():
                module_vars_hparams.append(line.strip().split(":")[0])

    with open(script_file) as f:
        used = extract_patterns(f.readlines(), module_var, stop_char)
    used = [u for u in used if u and u not in avoid_lst]

    ok = True
    for var in used:
        if var not in module_vars_hparams:
            logger.error(
                "Variable self.modules.%s used in %s but not declared "
                "under %s in %s",
                var, script_file, module_key, hparam_file,
            )
            ok = False
    return ok
