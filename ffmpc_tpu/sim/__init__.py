from .paths import SCENE_XML, ASSETS_DIR
