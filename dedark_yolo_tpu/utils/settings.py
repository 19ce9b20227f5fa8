"""Persistent user settings with corruption self-heal.

Counterpart of the reference SettingsManager (ultralytics/utils/__init__.py:737-818):
a versioned yaml at ~/.config/dedark_yolo_tpu/settings.yaml holding datasets_dir,
weights_dir, runs_dir and feature toggles; reset to defaults when keys/types
drift or the file is corrupt.
"""

from __future__ import annotations

import os
from pathlib import Path

from ..cfg import yaml_load, yaml_save
from . import LOGGER

SETTINGS_VERSION = "0.1.0"


def _config_dir():
    base = os.environ.get("XDG_CONFIG_HOME", str(Path.home() / ".config"))
    return Path(base) / "dedark_yolo_tpu"


class SettingsManager(dict):
    def __init__(self, file=None):
        self.file = Path(file) if file else _config_dir() / "settings.yaml"
        root = Path.cwd()
        self.defaults = {
            "settings_version": SETTINGS_VERSION,
            "datasets_dir": str(root / "datasets"),
            "weights_dir": str(root / "weights"),
            "runs_dir": str(root / "runs"),
            "sync": False,          # anonymous telemetry: off (no HUB here)
            "tensorboard": True,
        }
        super().__init__(self.defaults)
        try:
            if self.file.is_file():
                loaded = yaml_load(self.file)
                correct_keys = set(loaded) == set(self.defaults)
                correct_types = all(isinstance(loaded.get(k), type(v))
                                    for k, v in self.defaults.items())
                correct_version = loaded.get("settings_version") == SETTINGS_VERSION
                if correct_keys and correct_types and correct_version:
                    self.update(loaded)
                else:
                    LOGGER.info("settings out of date or corrupt; resetting "
                                f"to defaults at {self.file}")
                    self.save()
            else:
                self.save()
        except Exception as e:
            LOGGER.info(f"settings load failed ({e}); using defaults")

    def save(self):
        yaml_save(self.file, dict(self))

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)

    def reset(self):
        self.clear()
        super().update(self.defaults)
        self.save()


SETTINGS = None


def get_settings():
    global SETTINGS
    if SETTINGS is None:
        SETTINGS = SettingsManager()
    return SETTINGS
