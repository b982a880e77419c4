package graft.sources

import scala.annotation.tailrec
import org.apache.spark.sql.DataFrame
import graft.operators.Evolve

/** S4: paginated REST-style scan (`LowElo` page++ until empty,
  * `EC2/fetcher.py:62-90`) as a driver-side iterate-and-union.
  *
  * The page FETCH is inherently sequential and external (the reference
  * stops at the first empty page — page n+1's existence is unknown until
  * page n returns), so the driver loop is the honest shape; each fetched
  * page is a distributed DataFrame, and the union of pages is evaluated
  * lazily as ONE plan (Spark unions are metadata — no data moves until an
  * action). Schema drift across pages evolves via [[Evolve.unionEvolve]].
  */
object Paginate {

  /** Union pages `startPage, startPage+1, ...` until `fetch` returns None
    * or an empty page (checked via cheap `isEmpty` on the page — limit-1
    * scan), up to `maxPages`. None if no page yielded rows. */
  def scan(fetch: Int => Option[DataFrame], startPage: Int = 1,
      maxPages: Int = 1000): Option[DataFrame] = {
    @tailrec
    def loop(page: Int, acc: List[DataFrame]): List[DataFrame] =
      if (page - startPage >= maxPages) acc
      else fetch(page) match {
        case Some(df) if !df.isEmpty => loop(page + 1, df :: acc)
        case _ => acc
      }
    loop(startPage, Nil).reverse match {
      case Nil => None
      case pages => Some(Evolve.unionEvolve(pages))
    }
  }
}
