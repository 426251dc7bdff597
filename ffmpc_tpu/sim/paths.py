"""Asset path helpers."""

from pathlib import Path

ASSETS_DIR = Path(__file__).resolve().parent / "assets"
SCENE_XML = ASSETS_DIR / "panda_table_scene.xml"
