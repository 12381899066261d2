"""Temporal map-algebra front-end — the engine's ``t.rast.algebra`` /
``t.rast.mapcalc``.

The reference parses expressions with PLY and *immediately* executes
per-granule r.mapcalc process chains (``temporal_algebra.py:2320-3371``,
``temporal_raster_base_algebra.py``) — parse, plan and execution are
fused.  This engine keeps them separate on purpose (SURVEY §3.2): the
expression compiles to a **DataFrame plan** and Catalyst does the
optimization GRASS never had.

Supported surface (the load-bearing subset of the reference grammar):

* arithmetic ``+ - * / %`` between datasets (implicit *equal* temporal
  join, left extent policy) and scalars; explicit
  ``{op,relations,policy}`` is parsed, with ``equal``/``l`` supported;
* comparisons ``< <= > >= == !=`` and boolean ``&& ||``;
* ``if(cond, then[, else])`` conditionals (``temporal_algebra.py:3073``);
* selection ``A : B`` / anti-selection ``A !: B``
  (``temporal_algebra.py:2977-3071``) — semi/anti equal-join;
* ``merge(A, B)`` dataset union (``temporal_algebra.py:2651-2709``);
* r.mapcalc scalar functions (``lib/calc/function.c:3-76``): exp, log,
  sqrt, abs, sin, cos, tan, asin, acos, atan, int, float, double,
  round, ceil, floor, pow, isnull, isntnull, null(), min, max;
* temporal accessors (``temporal_algebra.py:499-549``): td(),
  start_time(), start_doy(), start_dow(), start_year(), start_month(),
  start_week(), start_day(), start_hour(), start_minute(),
  start_second().

Every dataset is a DataFrame with key columns, a bucket/time column and
a value column; the evaluator normalizes them to (keys..., __time,
[__end,] __val) and composes joins bottom-up.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+\.\d*|\.\d+|\d+)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<topr>\{[^}]*\})"
    r"|(?P<op>!:|&&|\|\||==|!=|<=|>=|[-+*/%():,<>])"
    r")"
)


def tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            rest = s[pos:].strip()
            if not rest:
                break
            raise SyntaxError(f"bad token at: {rest[:20]!r}")
        pos = m.end()
        for kind in ("num", "name", "topr", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("end", ""))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Num:
    v: float


@dataclass
class Ref:
    name: str


@dataclass
class Bin:
    op: str
    a: object
    b: object
    relations: tuple[str, ...] = ("equal",)
    policy: str = "l"


@dataclass
class Call:
    fn: str
    args: list


@dataclass
class Select:
    a: object
    b: object
    negate: bool
    relations: tuple[str, ...] = ("equal",)


class Parser:
    """Precedence-climbing parser: ||  &&  cmp  + -  * / %  unary  atom."""

    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def eat(self, kind=None, val=None):
        k, v = self.toks[self.i]
        if (kind and k != kind) or (val and v != val):
            raise SyntaxError(f"expected {val or kind}, got {v!r}")
        self.i += 1
        return v

    def parse(self):
        e = self.or_expr()
        if self.peek()[0] != "end":
            raise SyntaxError(f"trailing input at {self.peek()[1]!r}")
        return e

    def or_expr(self):
        e = self.and_expr()
        while self.peek() == ("op", "||"):
            self.eat()
            e = Bin("||", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.cmp_expr()
        while self.peek() == ("op", "&&"):
            self.eat()
            e = Bin("&&", e, self.cmp_expr())
        return e

    def cmp_expr(self):
        e = self.select_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("<", "<=", ">", ">=", "==", "!="):
            op = self.eat()
            e = Bin(op, e, self.select_expr())
        return e

    def select_expr(self):
        e = self.add_expr()
        while True:
            k, v = self.peek()
            if k == "op" and v in (":", "!:"):
                self.eat()
                e = Select(e, self.add_expr(), negate=v == "!:")
            elif k == "topr" and v.strip("{}").split(",")[0].strip() in (":", "!:"):
                # parameterized select {:,relations[,policy]} —
                # temporal_algebra.py:2977-3072
                spec = self.eat("topr").strip("{}")
                parts = [p.strip() for p in spec.split(",")]
                rels = tuple(
                    r.strip()
                    for r in (parts[1].split("|") if len(parts) > 1 and parts[1] else ["equal"])
                )
                e = Select(e, self.add_expr(), negate=parts[0] == "!:", relations=rels)
            else:
                return e

    def add_expr(self):
        e = self.mul_expr()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-"):
                self.eat()
                e = Bin(v, e, self.mul_expr())
            elif k == "topr":
                if v.strip("{}").split(",")[0].strip() in (":", "!:"):
                    return e  # parameterized select — handled one level up
                e = self._temporal_op(e)
            else:
                return e

    def _temporal_op(self, left):
        spec = self.eat("topr").strip("{}")
        parts = [p.strip() for p in spec.split(",")]
        op = parts[0]
        relations = tuple(
            r.strip() for r in (parts[1].split("|") if len(parts) > 1 and parts[1] else ["equal"])
        )
        policy = parts[2] if len(parts) > 2 else "l"
        if op not in ("+", "-", "*", "/", "%"):
            raise SyntaxError(f"unsupported temporal operator function {op!r}")
        right = self.mul_expr()
        return Bin(op, left, right, relations=relations, policy=policy)

    def mul_expr(self):
        e = self.unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            op = self.eat()
            e = Bin(op, e, self.unary())
        return e

    def unary(self):
        if self.peek() == ("op", "-"):
            self.eat()
            return Bin("-", Num(0.0), self.unary())
        return self.atom()

    def atom(self):
        k, v = self.peek()
        if k == "num":
            self.eat()
            return Num(float(v))
        if k == "name":
            self.eat()
            if self.peek() == ("op", "("):
                self.eat()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.or_expr())
                    while self.peek() == ("op", ","):
                        self.eat()
                        args.append(self.or_expr())
                self.eat("op", ")")
                return Call(v, args)
            return Ref(v)
        if k == "op" and v == "(":
            self.eat()
            e = self.or_expr()
            self.eat("op", ")")
            return e
        raise SyntaxError(f"unexpected token {v!r}")


def parse(expr: str):
    return Parser(tokenize(expr)).parse()


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------

_SCALAR_FNS = {
    "exp": F.exp, "log": F.log, "sqrt": F.sqrt, "abs": F.abs,
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "asin": F.asin, "acos": F.acos, "atan": F.atan,
    "ceil": F.ceil, "floor": F.floor, "round": F.round,
    "int": lambda c: c.cast("int"), "float": lambda c: c.cast("float"),
    "double": lambda c: c.cast("double"),
    "isnull": lambda c: c.isNull(), "isntnull": lambda c: c.isNotNull(),
}

_TIME_FNS = {
    "start_time": lambda t, e: t,
    "start_doy": lambda t, e: F.dayofyear(t),
    "start_dow": lambda t, e: F.dayofweek(t),
    "start_year": lambda t, e: F.year(t),
    "start_month": lambda t, e: F.month(t),
    "start_week": lambda t, e: F.weekofyear(t),
    "start_day": lambda t, e: F.dayofmonth(t),
    "start_hour": lambda t, e: F.hour(t),
    "start_minute": lambda t, e: F.minute(t),
    "start_second": lambda t, e: F.second(t),
    "td": lambda t, e: (F.unix_micros(e) - F.unix_micros(t)) / 1e6,
}

_BIN_COL = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "%": lambda a, b: a % b,
    "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
    "&&": lambda a, b: a & b, "||": lambda a, b: a | b,
}


@dataclass
class _Frame:
    df: DataFrame  # normalized: keys..., __time, [__end,] __val


@dataclass
class _Scalar:
    col: object          # Column or python literal
    time_dep: bool = False  # built from __time/__end — needs a frame


class TemporalAlgebra:
    """Evaluate algebra expressions over named datasets.

    ``env`` maps dataset name -> DataFrame; ``time_col``/``end_col``/
    ``value_col`` name its schema (end optional).
    """

    def __init__(
        self,
        keys: list[str] | None = None,
        time_col: str = "bucket_start",
        end_col: str | None = "bucket_end",
        value_col: str = "value",
    ):
        self.keys = ["conv_id"] if keys is None else list(keys)
        self.time_col = time_col
        self.end_col = end_col
        self.value_col = value_col

    # -- frame normalization ------------------------------------------
    def _norm(self, df: DataFrame) -> DataFrame:
        cols = [F.col(k) for k in self.keys] + [
            F.col(self.time_col).alias("__time"),
            F.col(self.value_col).alias("__val"),
        ]
        if self.end_col and self.end_col in df.columns:
            cols.insert(len(self.keys) + 1, F.col(self.end_col).alias("__end"))
        return df.select(*cols)

    def _denorm(self, df: DataFrame) -> DataFrame:
        out = df.withColumnRenamed("__time", self.time_col).withColumnRenamed(
            "__val", self.value_col
        )
        if "__end" in df.columns and self.end_col:
            out = out.withColumnRenamed("__end", self.end_col)
        return out

    # -- public ---------------------------------------------------------
    def eval(self, expr: str, env: dict[str, DataFrame]) -> DataFrame:
        ast = parse(expr)
        res = self._eval(ast, {k: self._norm(v) for k, v in env.items()})
        if isinstance(res, _Scalar):
            raise ValueError("expression has no dataset reference")
        return self._denorm(res.df)

    # -- core -------------------------------------------------------------
    def _join_cols(self, df: DataFrame) -> list[str]:
        return [*self.keys, "__time"]

    def _eval(self, node, env):
        if isinstance(node, Num):
            return _Scalar(F.lit(node.v))
        if isinstance(node, Ref):
            if node.name not in env:
                raise KeyError(f"unknown dataset {node.name!r}")
            return _Frame(env[node.name])
        if isinstance(node, Select):
            a = self._eval(node.a, env)
            b = self._eval(node.b, env)
            if not isinstance(a, _Frame) or not isinstance(b, _Frame):
                raise ValueError("':' operands must be datasets")
            how = "left_anti" if node.negate else "left_semi"
            if set(node.relations) == {"equal"}:
                return _Frame(
                    a.df.join(
                        b.df.select(*self._join_cols(b.df)),
                        on=self._join_cols(a.df), how=how,
                    )
                )
            # relation-parameterized select: semi/anti join on the Allen
            # predicates over the extent columns (keys still equi-joined)
            from grass_spark.functions import relations as _rel

            a_e = F.col("__end") if "__end" in a.df.columns else F.lit(None).cast("timestamp")
            bsel = b.df.select(
                *[F.col(k).alias(f"__b_{k}") for k in self.keys],
                F.col("__time").alias("__b_time"),
                (F.col("__end") if "__end" in b.df.columns else F.lit(None).cast("timestamp")).alias("__b_end"),
            )
            cond = _rel.any_relation(
                list(node.relations), F.col("__time"), a_e,
                F.col("__b_time"), F.col("__b_end"),
            )
            for k in self.keys:
                cond = cond & (F.col(k) == F.col(f"__b_{k}"))
            return _Frame(a.df.join(bsel, on=cond, how=how))
        if isinstance(node, Call):
            return self._call(node, env)
        if isinstance(node, Bin):
            return self._bin(node, env)
        raise TypeError(node)

    def _bin(self, node: Bin, env):
        a = self._eval(node.a, env)
        b = self._eval(node.b, env)
        fn = _BIN_COL[node.op]
        if node.policy not in ("l", "r", "u", "i"):
            raise NotImplementedError(
                f"temporal extent policy {node.policy!r} not supported "
                "(l | r | u | i)"
            )
        if isinstance(a, _Frame) and isinstance(b, _Frame):
            if set(node.relations) == {"equal"}:
                bb = b.df.select(
                    *self._join_cols(b.df), F.col("__val").alias("__val_r")
                )
                joined = a.df.join(bb, on=self._join_cols(a.df), how="inner")
                return _Frame(
                    joined.withColumn(
                        "__val", fn(F.col("__val"), F.col("__val_r"))
                    ).drop("__val_r")
                )
            return self._relation_join(a, b, fn, node.relations, node.policy)
        if isinstance(a, _Frame):
            return _Frame(a.df.withColumn("__val", fn(F.col("__val"), self._as_col(b))))
        if isinstance(b, _Frame):
            return _Frame(b.df.withColumn("__val", fn(self._as_col(a), F.col("__val"))))
        return _Scalar(
            fn(self._as_col(a), self._as_col(b)),
            time_dep=a.time_dep or b.time_dep,
        )

    @staticmethod
    def _as_col(s: _Scalar) -> Column:
        return s.col

    def _relation_join(self, a, b, fn, relations, policy):
        """Arithmetic across datasets related by arbitrary Allen
        relations (``A {+,during,u} B`` — temporal_raster_base_algebra
        spatio-temporal operators).  Keys stay equi-joined; extents join
        on the relation predicates; the result extent follows the
        policy: l=left, r=right, u=union, i=intersection
        (temporal_operator.py doctests)."""
        from grass_spark.functions import relations as _rel

        a_end = (
            F.col("__end") if "__end" in a.df.columns
            else F.lit(None).cast("timestamp")
        )
        bsel = b.df.select(
            *[F.col(k).alias(f"__b_{k}") for k in self.keys],
            F.col("__time").alias("__b_time"),
            (
                F.col("__end") if "__end" in b.df.columns
                else F.lit(None).cast("timestamp")
            ).alias("__b_end"),
            F.col("__val").alias("__val_r"),
        )
        cond = _rel.any_relation(
            list(relations), F.col("__time"), a_end,
            F.col("__b_time"), F.col("__b_end"),
        )
        for k in self.keys:
            cond = cond & (F.col(k) == F.col(f"__b_{k}"))
        joined = a.df.join(bsel, on=cond, how="inner")

        if policy == "l":
            t, e = F.col("__time"), a_end
        elif policy == "r":
            t, e = F.col("__b_time"), F.col("__b_end")
        elif policy == "u":
            t = F.least(F.col("__time"), F.col("__b_time"))
            e = F.greatest(
                F.coalesce(a_end, F.col("__time")),
                F.coalesce(F.col("__b_end"), F.col("__b_time")),
            )
        else:  # "i"
            t = F.greatest(F.col("__time"), F.col("__b_time"))
            e = F.least(
                F.coalesce(a_end, F.col("__time")),
                F.coalesce(F.col("__b_end"), F.col("__b_time")),
            )
        out = (
            joined.withColumn("__val", fn(F.col("__val"), F.col("__val_r")))
            .withColumn("__new_time", t)
            .withColumn("__new_end", e)
            .drop("__time", "__end", "__val_r", "__b_time", "__b_end",
                  *[f"__b_{k}" for k in self.keys])
            .withColumnRenamed("__new_time", "__time")
            .withColumnRenamed("__new_end", "__end")
        )
        return _Frame(out)

    def _call(self, node: Call, env):
        name = node.fn
        if name == "null":
            return _Scalar(F.lit(None).cast("double"))
        if name in _TIME_FNS:
            # td() resolves __end at join time — interval datasets only
            return _Scalar(
                _TIME_FNS[name](F.col("__time"), F.col("__end")), time_dep=True
            )
        if name == "merge":
            frames = [self._eval(a, env) for a in node.args]
            if not all(isinstance(f, _Frame) for f in frames):
                raise ValueError("merge() takes datasets")
            out = frames[0].df
            for f in frames[1:]:
                out = out.unionByName(f.df, allowMissingColumns=True)
            return _Frame(out)
        if name == "if":
            return self._if(node, env)
        if name in ("min", "max") and len(node.args) > 1:
            vals = [self._eval(a, env) for a in node.args]
            return self._nary(F.least if name == "min" else F.greatest, vals)
        if name == "pow" and len(node.args) == 2:
            vals = [self._eval(a, env) for a in node.args]
            return self._nary(F.pow, vals)
        if name in _SCALAR_FNS:
            (arg,) = [self._eval(a, env) for a in node.args] or [None]
            if isinstance(arg, _Frame):
                return _Frame(
                    arg.df.withColumn("__val", _SCALAR_FNS[name](F.col("__val")))
                )
            return _Scalar(_SCALAR_FNS[name](self._as_col(arg)), time_dep=arg.time_dep)
        # full r.mapcalc inventory fallback (graph, rand, bit ops,
        # n-variants, ... — functions/mapcalc.py)
        from grass_spark.functions.mapcalc import MAPCALC_FNS
        from grass_spark.functions.mapcalc import fn as mapcalc_fn

        if name in MAPCALC_FNS:
            vals = [self._eval(a, env) for a in node.args]
            return self._nary(lambda *cols: mapcalc_fn(name, *cols), vals)
        raise KeyError(f"unknown function {name!r}")

    def _nary(self, fn, vals):
        frames = [v for v in vals if isinstance(v, _Frame)]
        if not frames:
            return _Scalar(
                fn(*[self._as_col(v) for v in vals]),
                time_dep=any(v.time_dep for v in vals),
            )
        base = frames[0].df
        cols = []
        for i, v in enumerate(vals):
            if isinstance(v, _Frame):
                if v.df is base:
                    cols.append(F.col("__val"))
                else:
                    r = v.df.select(
                        *self._join_cols(v.df), F.col("__val").alias(f"__v{i}")
                    )
                    base = base.join(r, on=self._join_cols(base), how="inner")
                    cols.append(F.col(f"__v{i}"))
            else:
                cols.append(self._as_col(v))
        out = base.withColumn("__val", fn(*cols))
        return _Frame(out.drop(*[c for c in out.columns if c.startswith("__v") and c not in ("__val", "__time")]))

    def _if(self, node: Call, env):
        if len(node.args) not in (2, 3):
            raise ValueError("if(cond, then[, else])")
        cond = self._eval(node.args[0], env)
        then = self._eval(node.args[1], env)
        els = self._eval(node.args[2], env) if len(node.args) == 3 else _Scalar(
            F.lit(None).cast("double")
        )
        if not isinstance(cond, _Frame):
            raise ValueError("if() condition must reference a dataset")
        base = cond.df.withColumnRenamed("__val", "__cond")

        def attach(v, alias):
            nonlocal base
            if isinstance(v, _Frame):
                r = v.df.select(
                    *self._join_cols(v.df), F.col("__val").alias(alias)
                )
                base = base.join(r, on=self._join_cols(base), how="left")
                return F.col(alias)
            return self._as_col(v)

        tcol = attach(then, "__then")
        ecol = attach(els, "__else")
        out = base.withColumn(
            "__val", F.when(F.col("__cond"), tcol).otherwise(ecol)
        ).drop("__cond")
        return _Frame(out.drop("__then", "__else"))
