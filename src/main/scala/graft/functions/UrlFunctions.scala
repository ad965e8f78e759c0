package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization and registered-domain extraction — the
  * identity keys of every web-scale corpus pipeline (CommonCrawl-style
  * dedup, per-site quotas, domain mixing reports). A crawl sees the
  * same page under dozens of spellings (case, default ports, fragment,
  * tracking params, query order, dot-segments, trailing slashes);
  * exact dedup and per-domain caps are only correct after all of them
  * collapse to one canonical key.
  *
  * Spark ships `parse_url` but no canonicalizer and no public-suffix
  * logic, so these are native Catalyst `Expression`s (CodegenFallback,
  * same bridge as [[NativeExpressions]]): scalar, partition-local,
  * pushdown/prune-transparent, one flat JVM pass per row — exactly the
  * shape that scans 100 TB of crawl metadata without a shuffle.
  *
  * Canonicalization contract (deterministic, documented, total):
  *   1. trim; parse with `java.net.URI`; non-http(s), host-less, or
  *      unparseable input → NULL (never throws);
  *   2. scheme and host lowercased; a trailing dot on the host drops;
  *   3. default ports drop (http:80, https:443); other ports stay;
  *   4. the path `URI.normalize()`s (resolves `.`/`..`), duplicate
  *      slashes collapse, a trailing slash drops (except the bare
  *      root, which an empty path also becomes);
  *   5. the query splits on `&`, empty pairs and tracking params
  *      (`utm_*`, `gclid`, `fbclid`) drop, survivors sort bytewise and
  *      rejoin (percent-escapes are preserved as-is — decoding is
  *      lossy when the decoded octet is a delimiter);
  *   6. the fragment drops.
  *
  * Registered domain = one label + public suffix, against a documented
  * representative subset of the Mozilla Public Suffix List (the full
  * list is a data file swap — `MultiLabelSuffixes` — not a code
  * change). IP-literal hosts are their own registered domain.
  */
object UrlFunctions {

  private def toExpr(c: Column): Expression = ColumnBridge.expression(c)
  private def toCol(e: Expression): Column = ColumnBridge.column(e)

  /** Tracking parameters stripped by canonicalization: session-scoped
    * noise that never addresses content.
    */
  private val TrackingParams: Set[String] = Set("gclid", "fbclid", "msclkid")
  private def isTracking(key: String): Boolean =
    key.startsWith("utm_") || TrackingParams.contains(key)

  /** Multi-label public suffixes (representative subset of the public
    * suffix list; single-label TLDs need no entry — they are the
    * default). Longest match wins, so `ac.uk` beats `uk`.
    */
  private[graft] val MultiLabelSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "com.br", "net.br", "org.br", "com.cn", "net.cn", "org.cn",
    "co.in", "net.in", "org.in", "co.nz", "net.nz", "org.nz",
    "co.kr", "or.kr", "com.mx", "com.ar", "com.tr", "com.sg",
    "github.io", "gitlab.io", "blogspot.com")

  /** Canonical form per the contract above; None for anything that is
    * not an absolute http(s) URL with a host. Pure and total — a
    * malformed row must never kill a 100 TB scan.
    */
  def canonicalize(raw: String): Option[String] = {
    if (raw == null) return None
    val trimmed = raw.trim
    if (trimmed.isEmpty) return None
    val uri =
      try new java.net.URI(trimmed)
      catch { case _: java.net.URISyntaxException => return None }
    val scheme = Option(uri.getScheme).map(_.toLowerCase).orNull
    if (scheme != "http" && scheme != "https") return None
    var host = Option(uri.getHost).map(_.toLowerCase).orNull
    if (host == null || host.isEmpty) return None
    if (host.endsWith(".") && host.length > 1) host = host.dropRight(1)
    val port = uri.getPort match {
      case -1 => ""
      case 80 if scheme == "http" => ""
      case 443 if scheme == "https" => ""
      case p => s":$p"
    }
    // path: dot-segment resolution via URI.normalize, then the
    // crawl-side cleanups the RFC algorithm leaves alone
    val rawPath = Option(uri.normalize().getRawPath).getOrElse("")
    var path = rawPath.replaceAll("/{2,}", "/")
    if (path.isEmpty) path = "/"
    if (path.length > 1 && path.endsWith("/")) path = path.dropRight(1)
    val query = Option(uri.getRawQuery) match {
      case None => ""
      case Some(q) =>
        val kept = q.split("&", -1).iterator
          .filter(_.nonEmpty)
          .filterNot(p => isTracking(p.takeWhile(_ != '=').toLowerCase))
          .toArray
        java.util.Arrays.sort(kept, java.util.Comparator.naturalOrder[String]())
        if (kept.isEmpty) "" else kept.mkString("?", "&", "")
    }
    Some(s"$scheme://$host$port$path$query")
  }

  /** Registered domain of a HOST string (not a URL): one label plus
    * the longest matching public suffix; hosts that are bare suffixes,
    * single labels, or IP literals return themselves.
    */
  def registeredDomainOfHost(host0: String): Option[String] = {
    if (host0 == null) return None
    var host = host0.trim.toLowerCase
    if (host.endsWith(".") && host.length > 1) host = host.dropRight(1)
    if (host.isEmpty) return None
    if (host.forall(c => c.isDigit || c == '.') || host.contains(':'))
      return Some(host) // IPv4 / IPv6 literal
    val labels = host.split('.')
    if (labels.length <= 1) return Some(host)
    // longest multi-label suffix that matches and leaves >=1 label
    var suffixLen = 1 // default: single-label TLD
    var take = 2
    while (take < labels.length) {
      if (MultiLabelSuffixes.contains(labels.takeRight(take).mkString(".")))
        suffixLen = take
      take += 1
    }
    val n = math.min(labels.length, suffixLen + 1)
    Some(labels.takeRight(n).mkString("."))
  }

  /** Registered domain of a URL (canonicalizes first, so messy input
    * is fine).
    */
  def registeredDomainOfUrl(raw: String): Option[String] =
    canonicalize(raw).flatMap { c =>
      val host = c.drop(c.indexOf("//") + 2)
        .takeWhile(ch => ch != '/' && ch != ':' && ch != '?')
      registeredDomainOfHost(host)
    }

  case class CanonicalUrl(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      canonicalize(input.asInstanceOf[UTF8String].toString)
        .map(UTF8String.fromString).orNull
    override protected def withNewChildInternal(c: Expression): CanonicalUrl =
      copy(child = c)
  }

  case class RegisteredDomain(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      registeredDomainOfUrl(input.asInstanceOf[UTF8String].toString)
        .map(UTF8String.fromString).orNull
    override protected def withNewChildInternal(c: Expression): RegisteredDomain =
      copy(child = c)
  }

  /** Canonical URL column; NULL for non-http(s)/unparseable input. */
  def canonicalUrl(url: Column): Column = toCol(CanonicalUrl(toExpr(url)))

  /** Registered-domain column of a (possibly messy) URL. */
  def registeredDomain(url: Column): Column =
    toCol(RegisteredDomain(toExpr(url)))
}
