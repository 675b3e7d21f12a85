"""User-extension surface (SURVEY.md §2.10).

The reference's extension points are the pattern file (feature
templates as DATA), gazetteer lists, and CLI flags. Ours mirror them:

* ``FeatureTemplate`` — declarative template descriptions (family,
  offsets), the analogue of Wapiti pattern lines (``U00:%x[-2,0]``).
  The frozen default set lives in ner_ray.constants.FEATURE_FAMILIES;
  custom sets can be compiled into a model table with
  ``templates_to_rows`` and trained/assigned weights externally.
* ``Step`` protocol — a batch -> batch callable plus metadata: name,
  whether it is STATEFUL (=> Ray actor pool) or stateless (=> task
  pool), and resource hints. ``Pipeline`` composes Steps onto a
  ``ray.data.Dataset`` with the right map_batches invocation per step.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class FeatureTemplate:
    """One template family: e.g. FeatureTemplate("low", (-2,-1,0,1,2)).
    Equivalent to the Wapiti pattern lines U:%x[off,col] for each
    offset (unigram label features; bigram/label-pair features are the
    transition matrix)."""

    family: str
    offsets: tuple[int, ...] = (0,)

    def pattern_lines(self) -> list[str]:
        """Render in Wapiti pattern syntax (documentation / export)."""
        return [f"U{self.family}{o:+d}:%x[{o},{self.family}]"
                for o in self.offsets]


def templates_to_rows(templates, values_by_family, labels):
    """Expand (template x value x label) into sparse model rows with
    zero weights — the skeleton a trainer would fill (training itself
    is out of v1 scope; the reference's L-BFGS/SGD-L1 optimizers map
    to per-batch partial gradients + a driver-side update loop)."""
    rows = []
    for t in templates:
        for off in t.offsets:
            for v in values_by_family.get(t.family, []):
                for l in labels:
                    rows.append((f"{t.family}:{off}:{v}", l, 0.0))
    return rows


@dataclass
class Step:
    """One pipeline stage. ``fn`` is a callable batch->batch (plain
    function => stateless task pool) or a class (=> actor pool when
    ``stateful`` — setup runs once per actor in __init__)."""

    name: str
    fn: object
    stateful: bool = False
    batch_format: str = "pyarrow"
    batch_size: int | None = None
    concurrency: object = None
    num_cpus: float = 1.0
    fn_constructor_kwargs: dict = field(default_factory=dict)

    def apply(self, ds):
        kwargs: dict = {"batch_format": self.batch_format,
                        "num_cpus": self.num_cpus}
        if self.batch_size is not None:
            kwargs["batch_size"] = self.batch_size
        if self.stateful:
            kwargs["concurrency"] = self.concurrency or (1, 4)
            if self.fn_constructor_kwargs:
                kwargs["fn_constructor_kwargs"] = self.fn_constructor_kwargs
        elif self.concurrency is not None:
            kwargs["concurrency"] = self.concurrency
        return ds.map_batches(self.fn, **kwargs)


@dataclass
class Pipeline:
    """An ordered list of Steps applied to a Dataset. Lazy: returns the
    composed Dataset; the caller picks the consumption (write/agg)."""

    steps: list[Step]

    def run(self, ds):
        for step in self.steps:
            ds = step.apply(ds)
        return ds

    def describe(self) -> list[str]:
        return [
            f"{s.name}: {'actor-pool' if s.stateful else 'task-pool'} "
            f"[{self.__class__.__name__}] format={s.batch_format}"
            for s in self.steps
        ]
