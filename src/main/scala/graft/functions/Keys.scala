package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic document keying — the reference's idempotency device
  * (SURVEY.md §2.5).
  *
  * The reference keys payments by `md5(json.dumps(fields))` (reference
  * `src/blockchain_queries.py:224,243`), witness edges by
  * `md5(challengee + witness)` (`:276,306`), cities by `md5(city_id)`
  * (`:101,158`). We preserve *stability* (same logical content → same key)
  * rather than byte-parity with Python's `json.dumps` separators: keys are
  * internal identity, not data (SURVEY.md §2.5 D1 caveat). `to_json` over a
  * struct gives a canonical, codegen'd serialization with declared field
  * order.
  */
object Keys {

  /** Content-hash key over a canonical JSON rendering of the given columns
    * (D1: payments `_key`). Field order = argument order; pass columns in a
    * fixed documented order.
    */
  def contentKey(cols: Column*): Column = md5(to_json(struct(cols: _*)))

  /** Ordered-pair key (D2: witness `_key` = md5(challengee ‖ witness)). */
  def pairKey(a: Column, b: Column): Column = md5(concat(a, b))

  /** Scalar key (D5: city `_key` = md5(city_id) — "get rid of illegal
    * characters", reference `src/blockchain_queries.py:101`).
    */
  def scalarKey(c: Column): Column = md5(c)

  /** Vertex reference `collection/key` (F6, reference
    * `src/blockchain_queries.py:226-227`).
    */
  def vertexRef(collection: String, key: Column): Column =
    concat(lit(collection + "/"), key)

  /** Strip the collection prefix back off a vertex ref (F7, reference
    * `src/arango_queries.py:153` — AQL `LAST(SPLIT(v, '/'))`).
    */
  def vertexKey(ref: Column): Column = element_at(split(ref, "/"), -1)
}
