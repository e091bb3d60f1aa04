"""Model-file fetching: local dirs, URLs, (optional) HF hub.

Parity target: reference ``pretrained/fetching.py:26``.  Local-dir
resolution symlinks into the savedir; URLs download; HuggingFace-hub
downloads are attempted via huggingface_hub when importable (offline
environments fall back cleanly to local paths).
"""

import logging
import os
import pathlib
import shutil
import urllib.request

logger = logging.getLogger(__name__)

__all__ = ["fetch"]


def fetch(
    filename,
    source,
    savedir="./pretrained_model_checkpoints",
    overwrite=False,
    save_filename=None,
    use_auth_token=False,
    revision=None,
):
    """Resolve ``source/filename`` into a local file under ``savedir``.

    source may be: a local directory, a URL base, or a HF repo id.
    Returns the local Path.
    """
    if save_filename is None:
        save_filename = filename
    savedir = pathlib.Path(savedir)
    savedir.mkdir(parents=True, exist_ok=True)
    destination = savedir / save_filename
    if destination.exists() and not overwrite:
        return destination
    if str(source).startswith("http://") or str(source).startswith(
        "https://"
    ):
        url = str(source).rstrip("/") + "/" + filename
        logger.info(f"Fetching {url}")
        urllib.request.urlretrieve(url, destination)
        return destination
    source_path = pathlib.Path(source) / filename
    if source_path.exists():
        try:
            if destination.exists() or destination.is_symlink():
                destination.unlink()
            destination.symlink_to(source_path.absolute())
        except OSError:
            shutil.copy(source_path, destination)
        return destination
    # HuggingFace hub fallback
    try:
        import huggingface_hub

        logger.info(f"Fetching {filename} from HF hub repo {source}")
        fetched = huggingface_hub.hf_hub_download(
            repo_id=str(source), filename=filename, revision=revision
        )
        if destination.exists() or destination.is_symlink():
            destination.unlink()
        try:
            destination.symlink_to(pathlib.Path(fetched).absolute())
        except OSError:
            shutil.copy(fetched, destination)
        return destination
    except Exception as e:
        raise FileNotFoundError(
            f"Could not fetch {filename} from {source}: {e}"
        )
