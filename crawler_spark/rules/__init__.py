from crawler_spark.rules.spark import (  # noqa: F401
    ConstRule,
    CutRule,
    NoopRule,
    RegexRule,
    Rule,
    Trans,
    XPathRule,
    as_text,
    xpath_struct_expr,
)
