"""Context config domain: per-run run_config loading and hash tracking.

Behavioral analog of the reference config domain
(reference: waveform_analysis/core/context_config.py:166-434): a per-run
``run_config.json`` (path template-able) carries plugin blocks
(``run_config["plugins"][name]``) and hardware channel metadata
(``channel_metadata``); its hash is tracked so a changed file invalidates
that run's cached state before the next request.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)

DEFAULT_RUN_CONFIG_TEMPLATE = "{data_root}/{run_id}/run_config.json"


class ConfigDomain:
    """Run-config loading, hashing, and request preparation."""

    def __init__(self, context: Any) -> None:
        self.ctx = context
        self._run_configs: Dict[str, Optional[Dict[str, Any]]] = {}
        self._run_config_hashes: Dict[str, Optional[str]] = {}

    # -- run config ----------------------------------------------------------

    def run_config_path(self, run_id: str) -> Optional[str]:
        template = self.ctx.config.get(
            "run_config_path_template", DEFAULT_RUN_CONFIG_TEMPLATE
        )
        data_root = self.ctx.config.get("data_root")
        if "{data_root}" in template and not data_root:
            return None
        try:
            return template.format(data_root=data_root, run_id=run_id)
        except (KeyError, IndexError):
            logger.warning("Invalid run_config_path_template: %r", template)
            return None

    def load_run_config(self, run_id: str, force: bool = False) -> Optional[Dict[str, Any]]:
        if not force and run_id in self._run_configs:
            return self._run_configs[run_id]
        path = self.run_config_path(run_id)
        cfg = None
        if path and os.path.exists(path):
            try:
                with open(path) as fh:
                    cfg = json.load(fh)
            except (OSError, json.JSONDecodeError) as e:
                logger.warning("Failed to load run config %s: %s", path, e)
        self._run_configs[run_id] = cfg
        return cfg

    def get_run_config(self, run_id: str) -> Optional[Dict[str, Any]]:
        return self.load_run_config(run_id)

    def get_plugin_run_config(self, run_id: str, plugin_name: str) -> Dict[str, Any]:
        cfg = self.load_run_config(run_id)
        if not cfg:
            return {}
        plugins_block = cfg.get("plugins", {})
        block = plugins_block.get(plugin_name, {})
        return dict(block) if isinstance(block, dict) else {}

    def compute_run_config_hash(self, run_id: str) -> Optional[str]:
        cfg = self.load_run_config(run_id)
        if cfg is None:
            return None
        blob = json.dumps(cfg, sort_keys=True, default=str)
        return hashlib.sha1(blob.encode()).hexdigest()[:12]

    # -- request preparation -------------------------------------------------

    def prepare_request(self, run_id: str) -> None:
        """Reload run config; if its hash changed, invalidate the run's caches."""
        prev_hash = self._run_config_hashes.get(run_id, "__unset__")
        self.load_run_config(run_id, force=True)
        new_hash = self.compute_run_config_hash(run_id)
        if prev_hash != "__unset__" and prev_hash != new_hash:
            logger.info(
                "run_config changed for run %s (%s -> %s); invalidating caches",
                run_id, prev_hash, new_hash,
            )
            # memory entries for this run are stale
            for key in [k for k in self.ctx._results if k[0] == run_id]:
                del self.ctx._results[key]
                self.ctx._results_lineage.pop(key, None)
            self.ctx.cache_domain.clear_performance_caches()
        self._run_config_hashes[run_id] = new_hash

    def invalidate_run(self, run_id: str) -> None:
        self._run_configs.pop(run_id, None)
        self._run_config_hashes.pop(run_id, None)
