package graft.text

/** Structured path-facet extraction — the reference's `parse_path_meta`
  * (src/services/RAG/path_meta.py:18-58): course-archive paths of the form
  * `DEPT/LEVEL/SEMESTER/COURSE_FOLDER/FILENAME` parse into queryable
  * facets (department, level, semester, category, course code/number,
  * group key). Round 1-3 covered the WEB analog (url facets); this is the
  * reference's own rule set, behavioral-parity-exact:
  *
  *  - level: strip "level" (case-insensitive) from the level segment, take
  *    the first of 100|200|300|400|500 (path_meta.py:5-9);
  *  - semester: normalized table lookup (1/2/FIRST/SECOND/SEM1/... →
  *    "1"/"2", path_meta.py:12-15);
  *  - course code/number: first `letters{2,}[-_ ]*digits{2,3}` match in
  *    the course folder, falling back to the filename stem
  *    (path_meta.py:29-34);
  *  - level inference from a 3-digit course number when the level segment
  *    gave nothing (path_meta.py:36-37);
  *  - category: PQ folder names or past-question filenames → "PQ",
  *    GENERAL folder → "GENERAL" (path_meta.py:39-45);
  *  - group key: dept-code-num / code-num / dept / code / "MISC"
  *    (path_meta.py:47-51).
  *
  * Pure per-row string logic — used from a narrow typed map (the q_sniff
  * shape); every rule is replicated in the q_path_meta DuckDB oracle.
  */
object PathMeta {

  final case class Meta(
      department: String, level: String, semester: String, category: String,
      course_folder: String, course_code: String, course_number: String,
      filename: String, stem: String, group_key: String)

  private val CourseRe = "([A-Za-z]{2,})\\s*[-_ ]*\\s*(\\d{2,3})".r
  private val LevelRe = "(100|200|300|400|500)".r
  private val Sem = Map(
    "1" -> "1", "2" -> "2", "FIRST" -> "1", "SECOND" -> "2",
    "SEM1" -> "1", "SEM2" -> "2", "SEMESTER1" -> "1", "SEMESTER2" -> "2")

  def parse(path: String): Meta = {
    // pathlib parity: Path.parts keeps the root anchor as its own leading
    // part, so an absolute 4-segment path yields department "/" (exactly
    // what the reference's parts[-5] sees), not "".
    val split = path.split("/").filter(_.nonEmpty)
    val parts = if (path.startsWith("/")) "/" +: split else split
    def at(i: Int) = if (parts.length >= i) parts(parts.length - i) else ""
    val filename = at(1)
    val courseFolder = at(2)
    val semesterRaw = at(3)
    val levelRaw = at(4)
    val dept = at(5)

    val levelFromSegment =
      LevelRe.findFirstIn(levelRaw.replaceAll("(?i)level", "")).getOrElse("")
    val sem = Sem.getOrElse(semesterRaw.trim.toUpperCase.replace(" ", ""), "")
    // pathlib Path.stem parity (CPython: strip name[i:] only when
    // 0 < i < len-1 for i = name.rfind('.')): ".hidden" and "file." keep
    // their dot — a plain strip-last-suffix regex diverges on both.
    val dot = filename.lastIndexOf('.')
    val stem =
      if (dot > 0 && dot < filename.length - 1) filename.substring(0, dot) else filename

    val fromFolder = CourseRe.findFirstMatchIn(courseFolder)
      .map(m => (m.group(1).toUpperCase, m.group(2)))
    val (code, num) = fromFolder.orElse(
        CourseRe.findFirstMatchIn(stem).map(m => (m.group(1).toUpperCase, m.group(2))))
      .getOrElse(("", ""))

    val level =
      if (levelFromSegment.isEmpty && num.length >= 3 && "12345".contains(num.take(1)))
        num.take(1) + "00"
      else levelFromSegment

    val cfUp = courseFolder.toUpperCase
    val fnUp = filename.toUpperCase
    val category =
      if (Set("PQ", "PQS", "PASTQUESTIONS").contains(cfUp) || fnUp.contains("PQ") ||
          fnUp.contains("PAST QUESTION") || fnUp.contains("PAST QUESTIONS")) "PQ"
      else if (cfUp == "GENERAL") "GENERAL"
      else ""

    val groupKey =
      if (dept.nonEmpty && code.nonEmpty && num.nonEmpty) s"$dept-$code-$num"
      else if (code.nonEmpty && num.nonEmpty) s"$code-$num"
      else if (dept.nonEmpty) dept
      else if (code.nonEmpty) code
      else "MISC"

    Meta(dept, level, sem, category, courseFolder, code, num, filename, stem, groupKey)
  }
}
