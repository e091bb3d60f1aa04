"""Recipe test driver: run recipes with debug flags and check outputs.

Parity target: reference ``utils/recipe_tests.py:48,116,153,314``.
Recipes are listed in a CSV (script, hparams, test flags, expected
files, performance thresholds); the driver runs each in --debug mode
and validates results.
"""

import csv
import logging
import os
import subprocess
import sys

logger = logging.getLogger(__name__)

__all__ = ["load_recipe_csv", "check_files", "check_performance", "run_recipe_tests"]


def load_recipe_csv(csv_path):
    """Rows of the recipe-test table."""
    with open(csv_path, newline="") as f:
        return list(csv.DictReader(f, skipinitialspace=True))


def check_files(output_folder, expected_files):
    """All expected files exist under the output folder?"""
    missing = []
    for fname in expected_files:
        if not fname:
            continue
        if not os.path.exists(os.path.join(output_folder, fname)):
            missing.append(fname)
    if missing:
        logger.error(f"Missing expected files: {missing}")
    return not missing


def check_performance(train_log, metric, threshold, direction="min"):
    """Final metric from the train log within the threshold?"""
    last = None
    with open(train_log) as f:
        for line in f:
            for piece in line.strip().split(" - "):
                for kv in piece.split(","):
                    if ":" in kv:
                        k, v = kv.rsplit(":", 1)
                        if k.strip().endswith(metric):
                            try:
                                last = float(v)
                            except ValueError:
                                pass
    if last is None:
        logger.error(f"Metric {metric} not found in {train_log}")
        return False
    ok = last <= threshold if direction == "min" else last >= threshold
    if not ok:
        logger.error(
            f"{metric}={last} fails threshold {threshold} ({direction})"
        )
    return ok


def run_recipe_tests(
    recipe_csv,
    output_base="test_results",
    filters=None,
    run_opts="--debug",
):
    """Run every row's recipe with its debug flags; returns pass bools."""
    rows = load_recipe_csv(recipe_csv)
    results = {}
    for row in rows:
        rid = row.get("RecipeID") or row["Script_file"]
        if filters and not any(f in rid for f in filters):
            continue
        out_dir = os.path.join(output_base, rid.replace("/", "_"))
        cmd = (
            [sys.executable, row["Script_file"], row["Hparam_file"]]
            + row.get("test_debug_flags", run_opts).split()
            + [f"--output_folder={out_dir}"]
        )
        logger.info(f"Running: {' '.join(cmd)}")
        proc = subprocess.run(cmd, capture_output=True, text=True)
        ok = proc.returncode == 0
        if ok and row.get("check_files"):
            ok = check_files(out_dir, row["check_files"].split(";"))
        results[rid] = ok
        if not ok:
            logger.error(
                f"Recipe {rid} FAILED\n{proc.stdout[-2000:]}\n"
                f"{proc.stderr[-2000:]}"
            )
    return results


def check_row_for_test(row, filters, filters_fields, test_field):
    """True when a recipes.csv row passes the given field filters and
    defines the test flags field (reference
    ``utils/recipe_tests.py:48``).

    Example
    -------
    >>> row = {"Task": "ASR", "test_debug_flags": "--debug"}
    >>> check_row_for_test(row, [["ASR"]], ["Task"], "test_debug_flags")
    True
    """
    for field, values in zip(filters_fields, filters):
        if values is None:
            continue
        if row.get(field) not in values:
            return False
    return bool(row.get(test_field, "").strip())


def prepare_test(
    recipe_csvfile="tests/recipes.csv",
    script_field="Script_file",
    hparam_field="Hparam_file",
    test_field="test_debug_flags",
    filters=(),
    filters_fields=(),
):
    """Collect (script, hparams, flags) triples for testable rows
    (reference ``utils/recipe_tests.py:116``)."""
    rows = load_recipe_csv(recipe_csvfile)
    selected = []
    for row in rows:
        if filters and not check_row_for_test(
            row, filters, filters_fields, test_field
        ):
            continue
        if not row.get(test_field, "").strip():
            continue
        selected.append(
            (row[script_field], row[hparam_field], row[test_field])
        )
    return selected


def check_threshold(threshold, value):
    """Evaluate a "<=x" / ">=x" / "==x" threshold spec (reference
    ``utils/recipe_tests.py:153``).

    Example
    -------
    >>> check_threshold("<=1.5", 1.2)
    True
    >>> check_threshold(">=90", 85)
    False
    """
    spec = str(threshold).strip()
    if spec.startswith("<="):
        return value <= float(spec[2:])
    if spec.startswith(">="):
        return value >= float(spec[2:])
    if spec.startswith("=="):
        return value == float(spec[2:])
    if spec.startswith("<"):
        return value < float(spec[1:])
    if spec.startswith(">"):
        return value > float(spec[1:])
    return value == float(spec)


def run_test_cmd(cmd, stdout_file=None, stderr_file=None):
    """Run one recipe test command, returning the exit code (reference
    ``utils/recipe_tests.py:186``)."""
    import shlex
    import subprocess

    out = open(stdout_file, "w") if stdout_file else subprocess.DEVNULL
    err = open(stderr_file, "w") if stderr_file else subprocess.DEVNULL
    try:
        return subprocess.call(shlex.split(cmd), stdout=out, stderr=err)
    finally:
        for fh in (out, err):
            if hasattr(fh, "close"):
                fh.close()


def load_yaml_test(
    recipe_csvfile="tests/recipes.csv",
    hparam_field="Hparam_file",
    avoid_list=(),
):
    """Smoke-load every recipe yaml with tiny overrides (reference
    ``utils/recipe_tests.py:423``); returns False if any load fails."""
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    ok = True
    for row in load_recipe_csv(recipe_csvfile):
        hparam_file = row.get(hparam_field)
        if not hparam_file or hparam_file in avoid_list:
            continue
        try:
            with open(hparam_file) as f:
                load_hyperpyyaml(f, overrides_must_match=False)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR loading {hparam_file}: {e}")
            ok = False
    return ok
