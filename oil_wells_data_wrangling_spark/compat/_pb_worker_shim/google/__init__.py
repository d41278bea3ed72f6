"""Namespace stub so ``google.protobuf`` resolves through the alias
shim in ``google/protobuf/__init__.py``. ``extend_path`` keeps any
other ``google.*`` distribution packages on the host visible."""

from pkgutil import extend_path

__path__ = extend_path(__path__, __name__)  # type: ignore[has-type]
