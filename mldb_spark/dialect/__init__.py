"""The MLDB SQL dialect front-end (SURVEY §3, §4 'custom pieces').

This is the engine's own contribution on top of Catalyst: a parser
for MLDB's SQL dialect (reference grammar: hand-written recursive
descent in sql/sql_expression.cc:1260-2200 expressions,
:3050-3130 select lists, :4205-4355 statements) and a translator
that lowers the AST to PySpark DataFrame plans, where Catalyst does
all physical planning.

Dialect features beyond ANSI handled here:
- NAMED row-name expressions (sql/sql_expression.h:1764-1782)
- WHEN temporal cell filter (sql/sql_expression.h:1704-1760)
- DISTINCT ON (sql/sql_expression.cc:3087-3098)
- wildcard SELECT with prefixes and EXCLUDING
  (sql_expression_operations.h:407-445)
- open schema: unknown columns bind to NULL
  (doc ValueExpression.md:24)
- [] embedding literals and {} row literals
- $parameters, rowName()/rowHash() pseudo-columns
- CAST with fail→NULL semantics (try_cast)
"""

from mldb_spark.dialect.parser import parse_statement  # noqa: F401
from mldb_spark.dialect.translate import MldbContext  # noqa: F401
