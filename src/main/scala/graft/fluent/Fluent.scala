package graft.fluent

/**
 * Fluent conditional method-chaining combinators.
 *
 * Lets transformations stay in method-chain ("fluent") style even when a step
 * is conditional or is defined as a plain function:
 *
 * {{{
 *   df.call(addColumns)
 *     .when(doFilter).call(_.where($"x" > 0))
 *     .on(useV2).either(v2Transform).or(v1Transform)
 * }}}
 *
 * Semantics match the reference's fluent surface
 * (/root/reference/src/main/scala/uk/co/gresearch/package.scala:21-143,
 * CONDITIONAL.md:1-74), re-implemented from scratch.
 */
object Fluent {

  implicit class ExtendedAny[T](val t: T) extends AnyVal {
    /** Apply `f` to this value: `t.call(f) == f(t)`. */
    def call[R](f: T => R): R = f(t)

    /** Conditional application: `t.when(cond).call(f)` applies `f` only if
      * `cond` is true, otherwise returns `t` unchanged. */
    def when(condition: Boolean): WhenTransformation[T] =
      new WhenTransformation(t, condition)

    /** Branching application: `t.on(cond).either(f).or(g)` applies `f` when
      * `cond` is true, `g` otherwise. The two branches may change the type. */
    def on(condition: Boolean): OnCondition[T] =
      new OnCondition(t, condition)
  }

  final class WhenTransformation[T](t: T, condition: Boolean) {
    def call(f: T => T): T = if (condition) f(t) else t
  }

  final class OnCondition[T](t: T, condition: Boolean) {
    def either[R](f: T => R): OnEither[T, R] = new OnEither(t, condition, f)
  }

  final class OnEither[T, R](t: T, condition: Boolean, thenF: T => R) {
    def or(elseF: T => R): R = if (condition) thenF(t) else elseF(t)
  }
}
