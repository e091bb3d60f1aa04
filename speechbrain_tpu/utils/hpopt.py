"""Hyperparameter-optimization integration (Orion-compatible surface).

Parity target: reference ``utils/hpopt.py:39,78,285``: a reporter
registry, a context manager that wires ``hpopt_mode`` hparams, and
result reporting that external HPO tools (Orion, or a generic JSON
consumer) can scrape.
"""

import json
import logging
import sys

logger = logging.getLogger(__name__)

__all__ = [
    "hpopt_mode",
    "GenericHyperparameterOptimizationReporter",
    "OrionHyperparameterOptimizationReporter",
    "HyperparameterOptimizationContext",
    "hyperparameter_optimization",
    "report_result",
    "get_trial_id",
]

_hpopt_modes = {}
_current_context = None


def hpopt_mode(mode):
    """Decorator registering a reporter class for a mode name."""

    def register(cls):
        _hpopt_modes[mode] = cls
        return cls

    return register


@hpopt_mode("generic")
class GenericHyperparameterOptimizationReporter:
    """Prints the objective as a JSON line for external scrapers."""

    def __init__(self, objective_key="objective", output=None, *args, **kwargs):
        self.objective_key = objective_key
        self.output = output or sys.stdout

    def report_objective(self, result):
        """Report the objective value to the hpopt backend."""
        json.dump(
            {
                **result,
                "objective": result.get(self.objective_key),
            },
            self.output,
        )
        self.output.write("\n")

    @property
    def is_available(self):
        """Whether this backend/resource can be used here."""
        return True

    @property
    def trial_id(self):
        """Identifier of the current hyperparameter trial."""
        return "hpopt"


@hpopt_mode("orion")
class OrionHyperparameterOptimizationReporter:
    """Reports through orion.client when available."""

    def __init__(self, objective_key="objective", *args, **kwargs):
        self.objective_key = objective_key
        try:
            from orion.client import report_objective as orion_report

            self._report = orion_report
            self._available = True
        except ImportError:
            self._report = None
            self._available = False

    def report_objective(self, result):
        """Report the objective value to the hpopt backend."""
        if self._report is not None:
            self._report(result.get(self.objective_key))

    @property
    def is_available(self):
        """Whether this backend/resource can be used here."""
        return self._available

    @property
    def trial_id(self):
        """Identifier of the current hyperparameter trial."""
        import os

        return os.environ.get("ORION_TRIAL_ID", "orion")


class HyperparameterOptimizationContext:
    """Context manager producing a reporter from hparams/CLI flags.

    Example
    -------
    >>> import io
    >>> out = io.StringIO()
    >>> with HyperparameterOptimizationContext() as ctx:
    ...     ctx.reporter = GenericHyperparameterOptimizationReporter(
    ...         output=out)
    ...     report_result({"objective": 0.5})
    >>> "objective" in out.getvalue()
    True
    """

    def __init__(self, reporter_args=(), reporter_kwargs=None):
        self.reporter_args = reporter_args
        self.reporter_kwargs = reporter_kwargs or {}
        self.reporter = None
        self.result = None

    def parse_arguments(self, arg_list):
        """Wrap core.parse_arguments, extracting hpopt flags.

        Reference semantics (``utils/hpopt.py:312-367``): an ``--hpopt``
        override enables reporting; if its value is a YAML file path,
        that file is loaded (with ``trial_id`` available for ``!ref``)
        and merged under the CLI overrides — used for trial-specific
        settings like short epoch counts or disabled checkpointing.
        """
        import os

        import yaml

        from speechbrain_tpu.core import parse_arguments
        from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

        param_file, run_opts, overrides_yaml = parse_arguments(arg_list)
        overrides = (
            yaml.safe_load(overrides_yaml) if overrides_yaml else {}
        ) or {}
        hpopt = overrides.get("hpopt", False)
        mode = overrides.get("hpopt_mode") or "generic"
        if hpopt:
            cls = _hpopt_modes.get(mode, _hpopt_modes["generic"])
            self.reporter = cls(
                *self.reporter_args, **self.reporter_kwargs
            )
            if isinstance(hpopt, str) and os.path.exists(hpopt):
                with open(hpopt) as f:
                    hpopt_overrides = load_hyperpyyaml(
                        f,
                        overrides={"trial_id": get_trial_id()},
                        overrides_must_match=False,
                    )
                overrides = dict(hpopt_overrides, **overrides)
            for key in ("hpopt", "hpopt_mode"):
                overrides.pop(key, None)
        return param_file, run_opts, overrides

    def __enter__(self):
        global _current_context
        _current_context = self
        if self.reporter is None:
            mode = self.reporter_kwargs.pop("hpopt_mode", "generic")
            cls = _hpopt_modes.get(mode, _hpopt_modes["generic"])
            self.reporter = cls(
                *self.reporter_args, **self.reporter_kwargs
            )
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        global _current_context
        if exc_type is None and self.result is not None:
            self.reporter.report_objective(self.result)
        _current_context = None
        return False


def hyperparameter_optimization(*args, **kwargs):
    """Create an HPO context (reference-compatible entry point)."""
    return HyperparameterOptimizationContext(args, kwargs)


def report_result(result):
    """Record a result dict; reported when the context exits."""
    if _current_context is not None:
        _current_context.result = result
    else:
        GenericHyperparameterOptimizationReporter().report_objective(result)


def get_trial_id():
    """The active trial id ('hpopt' outside a managed trial)."""
    if _current_context is not None and _current_context.reporter:
        return _current_context.reporter.trial_id
    return "hpopt"


DEFAULT_REPORTER = "generic"


def get_reporter(mode, *args, **kwargs):
    """Instantiate the reporter registered for ``mode``, reverting to
    the generic reporter when unavailable (reference
    ``utils/hpopt.py:247``).

    Example
    -------
    >>> reporter = get_reporter("generic", objective_key="error")
    >>> reporter.report_objective({"error": 3.4})
    {"error": 3.4, "objective": 3.4}
    """
    reporter_cls = _hpopt_modes.get(mode)
    if reporter_cls is None:
        logger.warning(
            "hpopt_mode %s is not supported, reverting to generic", mode
        )
        reporter_cls = _hpopt_modes[DEFAULT_REPORTER]
    reporter = reporter_cls(*args, **kwargs)
    if not reporter.is_available:
        logger.warning("Reverting to a generic reporter")
        reporter_cls = _hpopt_modes[DEFAULT_REPORTER]
        reporter = reporter_cls(*args, **kwargs)
    return reporter


# Reference-name base alias (reference ``utils/hpopt.py:39``).
HyperparameterOptimizationReporter = GenericHyperparameterOptimizationReporter
