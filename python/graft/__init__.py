"""PySpark bindings for the graft Scala library (py4j wrappers).

Thin driver-side wrappers over the compiled Scala classes: each Python class
holds the JVM estimator, forwards `set*` calls with py4j argument conversion
(nested lists -> double[][], flat lists -> double[], Mat -> graft DMat), and
returns pyspark DataFrames from `transform`. No Python-side compute — the
JVM runs exactly the same code a Scala caller gets, so batch/streaming
semantics and results are identical.

Pattern follows the reference library's python binding layer
(reference: python/artan/filter/recursive_least_squares_filter.py), minus the
pyspark.ml.Params machinery the graft estimators don't use: graft setters are
plain chained mutators, so the wrapper is a generic forwarding proxy.

Usage (classpath must contain target/scala-2.13/classes):

    from graft import LinearKalmanFilter, Mat
    lkf = (LinearKalmanFilter(spark, 1, 1)
           .setStateKeyCol("key").setEventTimeCol("ts")
           .setMeasurementCol("meas")
           .setInitialStateCovariance(Mat([[10.0]]))
           .setProcessNoise(Mat([[1.0]]))
           .setMeasurementNoise(Mat([[4.0]])))
    out = lkf.transform(df)

Estimators whose parameters are functions (ExtendedKalmanFilter's state
transition lambdas, UKF/CKF) are not wrapped — Scala lambdas cannot cross
py4j; use the Scala API or the fixed-matrix LinearKalmanFilter family.
"""

from pyspark.sql import DataFrame


class Mat:
    """Row-major dense matrix literal: Mat([[a, b], [c, d]]) -> graft DMat."""

    def __init__(self, rows):
        self.num_rows = len(rows)
        self.num_cols = len(rows[0]) if rows else 0
        for r in rows:
            if len(r) != self.num_cols:
                raise ValueError("ragged matrix")
        self.values = [float(v) for r in rows for v in r]

    @staticmethod
    def eye(n, scale=1.0):
        return Mat([[scale if i == j else 0.0 for j in range(n)] for i in range(n)])


class _JvmEstimator:
    """Generic forwarding proxy around a graft JVM estimator."""

    _jvm_class = None  # e.g. "graft.filter.LinearKalmanFilter"

    def __init__(self, spark, *ctor_args):
        self._spark = spark
        self._jvm = spark._jvm
        cls = self._jvm
        for part in self._jvm_class.split("."):
            cls = getattr(cls, part)
        self._java_obj = cls(*[self._convert(a) for a in ctor_args])

    # ---------------------------------------------------- argument conversion

    def _double_array(self, vals):
        arr = self._spark._sc._gateway.new_array(self._jvm.double, len(vals))
        for i, v in enumerate(vals):
            arr[i] = float(v)
        return arr

    def _double_array_2d(self, rows):
        arr = self._spark._sc._gateway.new_array(self._jvm.double, len(rows), len(rows[0]))
        for i, r in enumerate(rows):
            for j, v in enumerate(r):
                arr[i][j] = float(v)
        return arr

    def _dmat(self, m):
        module = getattr(getattr(self._jvm.graft.linalg, "DMat$"), "MODULE$")
        return module.apply(m.num_rows, m.num_cols, self._double_array(m.values))

    def _convert(self, a):
        if isinstance(a, Mat):
            return self._dmat(a)
        if isinstance(a, (list, tuple)):
            if a and isinstance(a[0], (list, tuple)):
                return self._double_array_2d(a)
            return self._double_array(a)
        return a

    # ------------------------------------------------------------- forwarding

    def __getattr__(self, name):
        # only setter-style chained calls forward generically; anything else
        # (typos included) still reaches the JVM and fails there with the
        # real signature in the py4j error
        target = getattr(self._java_obj, name)

        def call(*args):
            result = target(*[self._convert(a) for a in args])
            # chained setters return the JVM estimator itself -> rewrap as self
            if result is not None and getattr(result, "_target_id", None) == \
                    getattr(self._java_obj, "_target_id", object()):
                return self
            if result is not None and result.__class__.__name__ == "JavaObject" \
                    and result.equals(self._java_obj):
                return self
            return result

        return call

    def transform(self, df):
        """Run the estimator on a pyspark DataFrame (batch or streaming)."""
        return DataFrame(self._java_obj.transform(df._jdf), self._spark)


class LinearKalmanFilter(_JvmEstimator):
    """graft.filter.LinearKalmanFilter(stateSize, measurementSize)."""
    _jvm_class = "graft.filter.LinearKalmanFilter"


class LinearKalmanSmoother(_JvmEstimator):
    """graft.smoother.LinearKalmanSmoother(stateSize, measurementSize)."""
    _jvm_class = "graft.smoother.LinearKalmanSmoother"


class RecursiveLeastSquaresFilter(_JvmEstimator):
    """graft.filter.RecursiveLeastSquaresFilter(featuresSize)."""
    _jvm_class = "graft.filter.RecursiveLeastSquaresFilter"


class LeastMeanSquaresFilter(_JvmEstimator):
    """graft.filter.LeastMeanSquaresFilter(featuresSize)."""
    _jvm_class = "graft.filter.LeastMeanSquaresFilter"


class MultivariateGaussianMixture(_JvmEstimator):
    """graft.mixture.MultivariateGaussianMixture(mixtureCount, sampleSize)."""
    _jvm_class = "graft.mixture.MultivariateGaussianMixture"


class PoissonMixture(_JvmEstimator):
    """graft.mixture.PoissonMixture(mixtureCount)."""
    _jvm_class = "graft.mixture.PoissonMixture"


class BernoulliMixture(_JvmEstimator):
    """graft.mixture.BernoulliMixture(mixtureCount)."""
    _jvm_class = "graft.mixture.BernoulliMixture"
