"""Plugin contract and registry.

Mirrors ``e2eRunner/.../Plugin.scala:19-37`` (``name`` +
``performAction(testDefinition, actualOrder) -> PluginResult``) and
``PluginResult.scala:21-71`` (result contract with overridable ``write``),
with a Python registry replacing the JVM classpath scan
(``PluginDefinitions.scala:65-86``).
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from hermes_spark.e2e.definitions import TestDefinition

log = logging.getLogger(__name__)


@dataclass
class PluginResult:
    arguments: tuple[str, ...]
    returned_value: Any
    order: int
    test_name: str
    passed: bool
    additional_info: dict[str, str] = field(default_factory=dict)

    def write(self, write_args: tuple[str, ...]) -> None:
        raise NotImplementedError(
            f"PluginResult {type(self).__name__} does not have an "
            "implementation of write function"
        )

    def result_log(self) -> str:
        state = "passed" if self.passed else "FAILED"
        return f"Test {self.test_name} (#{self.order}) {state}"

    def log_result(self) -> None:
        if self.passed:
            log.info(self.result_log())
        else:
            log.error(self.result_log())


@dataclass
class FailedPluginResult(PluginResult):
    """Wraps a thrown exception as a failed result
    (``plugins/FailedPluginResult.scala:26-40``)."""

    exception: Optional[BaseException] = None

    @classmethod
    def from_exception(
        cls,
        exc: BaseException,
        arguments: tuple[str, ...],
        order: int,
        test_name: str,
    ) -> "FailedPluginResult":
        return cls(
            arguments=arguments,
            returned_value=exc,
            order=order,
            test_name=test_name,
            passed=False,
            additional_info={},
            exception=exc,
        )

    def result_log(self) -> str:
        return (
            f"Test {self.test_name} (#{self.order}) FAILED with exception: "
            f"{self.returned_value}"
        )


class Plugin(ABC):
    """A test-step executor; subclass and register to make it available
    to test definitions by name."""

    @property
    @abstractmethod
    def name(self) -> str: ...

    @abstractmethod
    def perform_action(
        self, test_definition: TestDefinition, actual_order: int
    ) -> PluginResult: ...


_REGISTRY: dict[str, Callable[[], Plugin]] = {}


def register_plugin(factory: Callable[[], Plugin]) -> Callable[[], Plugin]:
    """Register a plugin factory (usable as a class decorator)."""
    instance = factory()
    _REGISTRY[instance.name] = factory
    return factory


def get_plugin(name: str) -> Plugin:
    if name not in _REGISTRY:
        raise KeyError(
            f"Plugin {name!r} is not registered. Available: "
            f"{sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]()


def registered_plugin_names() -> set[str]:
    return set(_REGISTRY)
