from kamu_cli_spark.functions.asserts import (
    assert_list_elements_not_null,
    assert_not_null,
)

__all__ = ["assert_not_null", "assert_list_elements_not_null"]
