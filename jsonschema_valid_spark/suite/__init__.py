from jsonschema_valid_spark.suite.spec import CheckSuite, SuiteError, SuiteBindError

__all__ = ["CheckSuite", "SuiteError", "SuiteBindError"]
