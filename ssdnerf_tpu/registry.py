"""Model registry and builder (mmgen MODELS registry analog)."""
from .models.autodecoders import MultiSceneNeRF, DiffusionNeRF

_MODELS = {
    'MultiSceneNeRF': MultiSceneNeRF,
    'DiffusionNeRF': DiffusionNeRF,
}


def register_model(name, cls):
    _MODELS[name] = cls


def build_model(model_cfg, train_cfg=None, test_cfg=None):
    cfg = dict(model_cfg)
    kind = cfg.get('type')
    if kind not in _MODELS:
        raise KeyError(f'Unknown model type {kind}')
    return _MODELS[kind](cfg, train_cfg=train_cfg, test_cfg=test_cfg)
