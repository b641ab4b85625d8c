from .core import I18nAuto, i18n

__all__ = ["I18nAuto", "i18n"]
